"""Structured Streaming: the windowed-counts transform produces identical
results through the streaming path (availableNow file source) and the
batch path."""

from __future__ import annotations

from api_to_amt_data_lake_spark.sources.parquet_io import read_table
from api_to_amt_data_lake_spark.streaming.events import (
    EVENT_SCHEMA,
    hourly_event_counts,
    stream_hourly_event_counts,
)


def test_stream_matches_batch(spark, tmp_path, sf_dir):
    events = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.write.parquet(src)

    q = stream_hourly_event_counts(
        spark,
        source_dir=src,
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_dir=str(tmp_path / "out"),
        available_now=True,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "out"))
    want = hourly_event_counts(spark.read.schema(EVENT_SCHEMA).parquet(src))
    key = ["window_start", "event_type"]
    n_got, n_want = got.count(), want.count()
    # Append mode only emits windows the watermark has closed: every emitted
    # row must match batch exactly; only the tail windows still inside the
    # 2h watermark may be withheld (≤ 3 hourly windows × 5 event types).
    assert 0 < n_want - n_got <= 15
    assert got.join(want, key + ["n_events", "value_sum"]).count() == n_got
    held_back = want.join(got, key, "left_anti")
    import pyspark.sql.functions as F
    max_start = want.agg(F.max("window_start")).collect()[0][0]
    cutoff = [r["window_start"] for r in held_back.collect()]
    assert all((max_start - ws).total_seconds() <= 3 * 3600 for ws in cutoff)
