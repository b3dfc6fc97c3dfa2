"""Streaming ANN index maintenance: foreachBatch + ann_index_append.

Composes the persisted IVFPQ index (`sources/ann_index.py`) with the
streaming fold discipline of `streaming/sink.py`: a stream of NEW
embedding rows (id, vector) keeps the index current — each micro-batch
is folded-encoded against the FROZEN trained models (no retrain, a pure
scan projection of the increment) and appended as new code files under
its buckets. This is the standing shape of a production vector index: a
crawl/embedding pipeline emits vectors continuously, the index absorbs
them shard by shard, and searches (`ann_index_search`) always see every
row appended so far with partition-pruned reads.

Replay safety mirrors the other sinks: the last applied batch id is
recorded in a marker file inside the index directory AFTER the append
commits; a replayed batch id is SKIPPED outright. A crash between the
append and the marker write re-appends on replay, which — unlike the
upsert sinks — would duplicate that batch's code rows; the exposure is
one micro-batch and `dedupe_codes` (one keyed distinct over the codes,
offline) restores exactness, the same recovery contract Delta users get
from OPTIMIZE after a dirty append. Callers who need strict
exactly-once should stage each batch to a path named by batch id and
move it in (rename is atomic); the marker path keeps the common case
(restart after commit) exact with zero overhead.

The models are trained ONCE (`build_ann_index`, typically on a sample —
`sample_frac`); drift is handled by periodic re-index
(`sources/ann_index.py::rebuild_ann_index` — retrain on the current
corpus, re-encode, atomic generation swap carrying the replay marker),
not by mutating a live index — matching FAISS/IVF production practice
where centroid stability is what makes shard appends consistent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from api_to_amt_data_lake_spark.sources.ann_index import (
    ann_index_append,
    load_ann_index,
)
from api_to_amt_data_lake_spark.sources.versioned import (
    read_marker,
    write_marker,
)


def _marker(index_root: str) -> str:
    return os.path.join(str(index_root), "_last_batch")


def last_applied_batch(index_root: str) -> int:
    return read_marker(_marker(index_root))


def fold_ann_batch(spark: SparkSession, batch_df: DataFrame,
                   batch_id: int, index_root: str,
                   compact_threshold: int | None = None) -> bool:
    """Append one micro-batch of (id, vector) rows to the persisted
    index; returns False when the batch id was already applied
    (replay skipped). Empty batches advance the marker only.

    `compact_threshold` bounds per-bucket file counts under sustained
    micro-batching (each append adds ~one file per touched bucket, so a
    long-lived stream otherwise accumulates thousands): buckets past
    the threshold are rewritten after the marker commits — compaction
    is content-preserving, so replay semantics are untouched."""
    if batch_id <= last_applied_batch(index_root):
        return False
    if not batch_df.isEmpty():
        ann_index_append(spark, index_root, batch_df)
    write_marker(_marker(index_root), batch_id)
    if compact_threshold is not None:
        from api_to_amt_data_lake_spark.sources.ann_index import (
            compact_index_buckets,
        )
        compact_index_buckets(spark, index_root,
                              max_files=compact_threshold)
    return True


def dedupe_codes(spark: SparkSession, index_root: str) -> int:
    """Offline recovery after a dirty append (crash between append and
    marker): rewrite the codes with one distinct over the full code key
    (id, bucket, sub_idx, code) — duplicate rows from a replayed batch
    collapse; rows are never otherwise equal across batches because ids
    are unique across shards (the append contract). Returns the row
    count removed. One shuffle over the codes (ids, not vectors).

    Crash-safe swap: the clean copy is fully written under a tmp name,
    the live dir is renamed ASIDE (one atomic rename — readers racing
    the swap still see a complete directory at one of the two names),
    the tmp renamed in, and only then is the old copy deleted. A crash
    at any point leaves a loadable codes dir; stale tmp/old leftovers
    are cleaned on the next run."""
    import shutil

    from api_to_amt_data_lake_spark.sources.ann_index import _writer_lock
    with _writer_lock(str(index_root)):
        return _dedupe_locked(spark, index_root)


def _dedupe_locked(spark: SparkSession, index_root: str) -> int:
    import shutil

    final = os.path.join(str(index_root), "codes")
    tmp = final + "._tmp"
    old = final + "._old"
    for leftover in (tmp, old):  # crash debris from a prior run
        shutil.rmtree(leftover, ignore_errors=True)
    coarse, book, codes, meta = load_ann_index(spark, index_root)
    before = codes.count()
    # Cluster by bucket before partitionBy (the bucket_store lesson:
    # unclustered partitioned writes emit tasks × partitions small
    # files) — the recovery rewrite doubles as compaction of the
    # per-append file accumulation.
    from pyspark.sql import functions as F
    codes.distinct().repartition(F.col("bucket")) \
        .write.partitionBy("bucket").parquet(tmp)
    os.rename(final, old)
    os.rename(tmp, final)
    shutil.rmtree(old, ignore_errors=True)
    # The rewrite replaced every code file, so the committed manifest
    # (meta["codes_files"] — what every reader resolves through) must be
    # re-pointed at the clean copy; offline recovery is single-writer by
    # contract, so the listing-then-commit is race-free here.
    from api_to_amt_data_lake_spark.sources.ann_index import (
        _list_codes_files,
        _read_meta,
        _write_meta_atomic,
    )
    meta2 = _read_meta(str(index_root))
    if "codes_files" in meta2:
        meta2["codes_files"] = sorted(_list_codes_files(str(index_root)))
        _write_meta_atomic(str(index_root), meta2)
    after = spark.read.parquet(final).count()
    return before - after


def stream_ann_index(
    stream_df: DataFrame,
    index_root: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    compact_threshold: int | None = None,
):
    """Start a stream appending every micro-batch of embedding rows to
    the persisted ANN index. The index must already exist
    (`build_ann_index`); the stream's columns must include the index's
    id and vector columns. `compact_threshold` keeps per-bucket file
    counts bounded under sustained micro-batching (see
    `fold_ann_batch`). Returns the StreamingQuery."""
    spark = stream_df.sparkSession

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_ann_batch(spark, batch_df, batch_id, index_root,
                       compact_threshold=compact_threshold)

    writer = stream_df.writeStream.foreachBatch(fold) \
        .option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
