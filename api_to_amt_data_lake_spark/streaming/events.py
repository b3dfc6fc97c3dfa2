"""Event-stream processing: one transformation, two drivers (batch+stream).

`_windowed_counts` is the shared logical plan; the batch entry point feeds
it a static DataFrame (conformance q25 oracle-checks it), the streaming
entry point feeds it a readStream with a watermark. This "write the
transform once, bind it to either source" shape is the idiomatic
Structured Streaming design — batch backfill and live stream cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def _windowed_counts(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "value_sum",
        )
    )


def hourly_event_counts(events: DataFrame) -> DataFrame:
    """Batch binding (used by conformance q25)."""
    return _windowed_counts(events)


def stream_hourly_event_counts(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Streaming binding: file source → watermarked window agg → parquet.

    `available_now=True` processes the current backlog then stops
    (batch-equivalent semantics — used by tests); with False it runs
    continuously on arriving files. Late events beyond the watermark are
    dropped instead of reopening closed windows — the state store stays
    bounded at any scale.
    """
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
    )
    agg = _windowed_counts(stream)
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
