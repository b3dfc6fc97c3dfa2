"""Streaming exact deduplication — the streaming form of
`operators/dedup.py::exact_dedup_groups`.

A 100 TB ingest stream cannot dedup against all history (unbounded
state); the practical contract is "drop duplicates arriving within the
watermark horizon". Spark's `dropDuplicatesWithinWatermark` keeps one
state row per key seen inside the watermark and evicts it when the
watermark passes — bounded state, append-only output, no full-history
shuffle. Exactly-once history-wide dedup stays a batch job
(`exact_dedup_groups`); this operator is the streaming guard in front of
it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop rows whose key columns repeat within the watermark horizon.

    `events` is a streaming DataFrame; the first arrival of each key is
    emitted, later arrivals inside the horizon are dropped, and state for
    a key is freed once the watermark passes its event time.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def content_dedup_stream(
    docs: DataFrame,
    content_col: str,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Content-hash variant: dedup on md5(content) instead of raw bytes so
    the state row is 16 bytes per distinct document, not the document."""
    hashed = docs.withColumn("_content_hash", F.md5(F.col(content_col)))
    return dedup_stream(hashed, ["_content_hash"], ts_col, watermark).drop(
        "_content_hash"
    )
