"""Time-bounded stream-stream join.

Batch interval joins (operators/joins.py::interval_join) have a streaming
sibling with one extra obligation: bounding the join state. Watermarks on
BOTH inputs plus a time-range join condition let Spark drop buffered rows
once they can no longer match — state is O(events inside the time bound),
not O(stream history). Without the range condition a stream-stream join
buffers forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join streaming `right` rows to streaming `left` rows with the same
    `key` where ``left_ts + lower <= right_ts <= left_ts + upper``.

    Example: purchases within 30 minutes AFTER a click →
    ``lower_seconds=0, upper_seconds=1800``. Both sides are watermarked so
    the engine can evict un-matchable buffered rows; `how` follows Spark's
    stream-stream support (inner; left_outer needs the watermark on the
    null-producing side).
    """
    l_wm = left.withWatermark(left_ts, watermark).alias("l")
    r_wm = right.withWatermark(right_ts, watermark).alias("r")
    lc, rc = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rc >= lc + F.expr(f"INTERVAL {lower_seconds} SECOND"))
        & (rc <= lc + F.expr(f"INTERVAL {upper_seconds} SECOND"))
    )
    return l_wm.join(r_wm, cond, how)
