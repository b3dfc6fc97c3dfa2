"""Streaming producer for mergeable grid-quantile partials.

`operators/sketches.py::grid_sketch` makes quantiles re-aggregatable:
binned counts add cell-wise, so a coarser rollup never re-reads raw
rows. This module is the STREAMING side of that contract — the shared
transform bins each event's value into the (window, keys, bin) grid,
and the streaming binding runs it under a watermark so grid state stays
bounded. The emitted hourly partials are exactly what
`grid_merge`/`grid_quantiles` consume: union them with (or in place of)
batch-built grids and read day-level or global quantiles off the merged
frame — the quantile analog of the q99y HLL rollup, with the same
"partials from the stream, answers from the merge" shape.

Same one-transform-two-drivers design as `events.py`: the batch binding
is oracle-checkable, the stream binding cannot drift from it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.streaming.events import EVENT_SCHEMA


def _windowed_grid(events: DataFrame, key_cols: list[str],
                   value_col: str, bin_width: int) -> DataFrame:
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"),
            *[F.col(k) for k in key_cols],
            F.floor(F.col(value_col) / F.lit(bin_width))
            .cast("long").alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("bucket_start"),
                *key_cols, "bin", "cnt")
    )


def hourly_value_grids(events: DataFrame, key_cols: list[str],
                       value_col: str, bin_width: int) -> DataFrame:
    """Batch binding: hour-bucket grid partials of `value_col`.

    Output (bucket_start, *keys, bin, cnt) rows merge into coarser
    grains with `grid_merge`-style cell-wise addition; per-bucket state
    is bounded by the value range / bin_width regardless of volume."""
    return _windowed_grid(events, key_cols, value_col, bin_width)


def stream_hourly_value_grids(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    key_cols: list[str],
    value_col: str,
    bin_width: int,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Streaming binding: file source → watermarked hourly grid partials
    → parquet. Each closed hour appends its (keys, bin, cnt) grid rows;
    the state store holds one counter per live (window, keys, bin) cell
    — bounded by the watermark horizon × grid size, never by event
    volume. Downstream quantile reads merge the emitted partials; late
    events beyond the watermark are dropped, not re-opened."""
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
    )
    grid = _windowed_grid(stream, key_cols, value_col, bin_width)
    writer = (
        grid.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
