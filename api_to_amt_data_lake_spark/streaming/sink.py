"""Streaming incremental gold sink: foreachBatch + upsert-latest.

Closes the loop between the streaming surface and the incremental
snapshot store (sources/incremental.py): each micro-batch folds into a
versioned parquet snapshot with newest-version-wins semantics, so a
stream of document updates maintains the same "current" table the batch
change-version pull produces. foreachBatch is the exactly-once idiom the
built-in file sink cannot provide for MERGE-style writes — the batch id
is recorded per snapshot version, and a replayed batch (restart after a
crash between write and commit) simply re-derives the same version.

At 100 TB the same function body targets Delta/Iceberg `MERGE INTO`;
the plain-parquet snapshot keeps this container dependency-free while
exercising the identical plan shape (upsert's one shuffle on the key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from api_to_amt_data_lake_spark.sources.incremental import refresh_snapshot


def stream_upsert_gold(
    stream_df: DataFrame,
    snapshot_root: str,
    school_year: str | int,
    endpoint: str,
    key_col: str,
    version_col: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
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
        refresh_snapshot(
            spark, batch_df, None, snapshot_root, school_year, endpoint,
            key_col=key_col, version_col=version_col,
        )

    writer = (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
