"""Streaming distinct-count partials via the min-uniform sketch.

COUNT(DISTINCT) does not stream: exact distinct state grows with the
key universe, and Spark rejects it in append mode outright. The
min-uniform sketch (`operators/sketches.py::minu_sketch`) is the
streaming-shaped fix — per (window, keys, cell) state is ONE double
maintained by a plain MIN aggregate, which Structured Streaming
supports natively under a watermark, and emitted partials merge
downstream by cell-wise min (`minu_merge`), so day-level or global
distinct estimates never re-read raw events.

HLL partials (`hll_hourly_sketches`) do the same job in batch with
better constants, but `hll_sketch_agg`'s binary register state is
engine-private; the min-uniform cells are plain doubles any engine —
or the conformance oracle — can recompute. Same one-transform-two-
drivers design as `events.py`/`quantiles.py`: the batch binding is
oracle-checkable, the stream binding cannot drift from it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators.sketches import minu_sketch
from api_to_amt_data_lake_spark.streaming.events import EVENT_SCHEMA


def _windowed_minu(events: DataFrame, key_cols: list[str],
                   distinct_col: str, k_cells: int) -> DataFrame:
    pre = events.withColumn("_w", F.window("ts", "1 hour"))
    sk = minu_sketch(pre, ["_w", *key_cols], distinct_col,
                     k_cells=k_cells)
    return sk.select(F.col("_w.start").alias("bucket_start"),
                     *key_cols, "cell", "umin")


def hourly_minu_sketches(events: DataFrame, key_cols: list[str],
                         distinct_col: str,
                         k_cells: int = 256) -> DataFrame:
    """Batch binding: hour-bucket min-uniform partials
    (bucket_start, *keys, cell, umin) — ≤ k_cells rows per bucket
    regardless of event volume; merge with `minu_merge`, read
    estimates with `minu_estimate`."""
    return _windowed_minu(events, key_cols, distinct_col, k_cells)


def stream_hourly_minu_sketches(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    key_cols: list[str],
    distinct_col: str,
    k_cells: int = 256,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Streaming binding: file source → watermarked hourly min-uniform
    partials → parquet. State per live (window, keys, cell) is a
    single double (the running min — MIN is one of the aggregates
    append-mode streaming supports without arbitrary state), bounded
    by watermark horizon × k_cells; each closed hour appends its ≤
    k_cells partial rows. Late events beyond the watermark are
    dropped, not re-opened."""
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
    )
    sk = _windowed_minu(stream, key_cols, distinct_col, k_cells)
    writer = (
        sk.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
