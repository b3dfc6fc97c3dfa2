"""Streaming incremental gold sink: foreachBatch + upsert-latest.

Closes the loop between the streaming surface and the incremental
snapshot store (sources/incremental.py): each micro-batch folds into a
versioned parquet snapshot with newest-version-wins semantics, so a
stream of document updates maintains the same "current" table the batch
change-version pull produces. foreachBatch is the exactly-once idiom the
built-in file sink cannot provide for MERGE-style writes. Two layers of
replay safety: the last applied batch id is recorded in a marker file
next to the snapshot, so a replayed batch (restart after the marker
committed) is SKIPPED outright; if the crash hit between the snapshot
write and the marker write, the replay re-merges — which the
newest-version-wins upsert makes content-idempotent (same current rows,
one extra version directory that pruning removes).

`n_buckets` is the MERGE shape itself (VERDICT r6 item 2, via
`sources/bucket_store.py`): snapshots live hive-partitioned by
key-hash bucket, a micro-batch reads only its touched buckets
(partition pruning), carry-over rows leave through a broadcast ANTI
join on the batch's keys (the snapshot is never exchanged on the key),
and the new version rewrites only touched buckets — untouched bucket
files are hard-linked from the previous version, byte-identical on
disk. Steady-state cost per micro-batch is O(touched buckets), the
Delta/Iceberg `MERGE INTO` contract in plain parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from api_to_amt_data_lake_spark.sources.incremental import (
    merge_increment,
    refresh_snapshot,
)
from api_to_amt_data_lake_spark.sources.versioned import (
    read_marker,
    write_marker,
)


def _marker_path(snapshot_root: str, school_year: str | int,
                 endpoint: str) -> str:
    return os.path.join(str(snapshot_root), str(school_year), endpoint,
                        "_last_batch")


def last_applied_batch(snapshot_root: str, school_year: str | int,
                       endpoint: str) -> int:
    """Highest micro-batch id folded into the snapshot, -1 before any."""
    return read_marker(_marker_path(snapshot_root, school_year, endpoint))


def fold_batch(spark: SparkSession, batch_df: DataFrame, batch_id: int,
               snapshot_root: str, school_year: str | int, endpoint: str,
               key_col: str, version_col: str,
               n_buckets: int | None = None) -> bool:
    """Fold one micro-batch into the snapshot; returns False when the
    batch id was already applied (replay) and the fold was skipped.

    Micro-batch ids are monotonically increasing and applied in order,
    so `batch_id <= last recorded` identifies a replay. The marker is
    written atomically (tmp + rename) AFTER the snapshot version
    commits; a crash between the two re-merges on replay, which the
    newest-version-wins upsert makes content-idempotent.

    `n_buckets` opts into the bucketed MERGE-splice store (module
    docstring): the fold scans and rewrites only the batch's touched
    buckets; use the same value for the snapshot's whole lifetime.
    """
    if batch_id <= last_applied_batch(snapshot_root, school_year, endpoint):
        return False
    if n_buckets is not None:
        from api_to_amt_data_lake_spark.sources.bucket_store import (
            fold_bucketed,
        )
        fold_bucketed(
            spark, os.path.join(str(snapshot_root), str(school_year)),
            endpoint, batch_df.select(key_col),
            # merge_increment(spliced=True) is already the row-level
            # splice: carry-over via broadcast anti, upsert over
            # base ⋉ keys ∪ increment only.
            lambda touched: merge_increment(
                touched, batch_df, None, key_col, version_col,
                spliced=True),
            key_col, n_buckets)
    else:
        refresh_snapshot(
            spark, batch_df, None, snapshot_root, school_year, endpoint,
            key_col=key_col, version_col=version_col,
        )
    write_marker(_marker_path(snapshot_root, school_year, endpoint),
                 batch_id)
    return True


def stream_upsert_gold(
    stream_df: DataFrame,
    snapshot_root: str,
    school_year: str | int,
    endpoint: str,
    key_col: str,
    version_col: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    n_buckets: int | None = None,
):
    """Start a stream that upserts every micro-batch into the snapshot.

    Returns the StreamingQuery; callers own awaitTermination/stop. The
    checkpoint directory gives restart-exactly-once at the source side;
    the snapshot's newest-version-wins merge makes replayed batches
    idempotent at the sink side.
    """
    spark = stream_df.sparkSession

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_batch(spark, batch_df, batch_id, snapshot_root, school_year,
                   endpoint, key_col=key_col, version_col=version_col,
                   n_buckets=n_buckets)

    writer = (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
