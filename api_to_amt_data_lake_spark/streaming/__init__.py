"""Structured Streaming surface.

The reference has no streaming operators (SURVEY.md §2.9) — its hourly
batch re-run maps to a scheduled batch job. This module exists for the
engine's own streaming-shaped workloads (the events table): the same
windowed-aggregation logical plan as the batch query q25, driven through
readStream/writeStream with watermarks.
"""

from api_to_amt_data_lake_spark.streaming.events import (
    hourly_event_counts,
    stream_hourly_event_counts,
)

__all__ = ["hourly_event_counts", "stream_hourly_event_counts"]
