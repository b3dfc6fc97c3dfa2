"""Gap-based sessionization: the one operator in this engine that genuinely
needs *custom state* in streaming form.

Two bindings of the same semantics (30-min default inactivity gap):

- :func:`sessionize_batch` — pure DataFrame windows (lag → gap flag →
  running sum → groupBy). Oracle-expressible ANSI SQL; conformance q41
  hash-checks it against DuckDB.
- :func:`sessionize_stream` — `applyInPandasWithState` over a watermarked
  stream. Per-user GroupState holds the open session (start, last-seen,
  count); events extend or close it, and an event-time timeout flushes a
  session once the watermark passes its gap horizon. This is the
  bounded-state design a 100 TB event stream needs: state size is
  O(active users), emission is append-only, late data beyond the
  watermark is dropped by the engine.

The reference has no streaming surface (SURVEY.md §2.9); this implements
the training-data-pipeline stateful-operator capability (session windows
over user activity) beyond reference parity.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_GAP_SECONDS = 1800

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

# Open-session state: epoch-microsecond bounds + running count.
_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
])


def sessionize_batch(events: DataFrame,
                     gap_seconds: int = DEFAULT_GAP_SECONDS) -> DataFrame:
    """Batch sessionization via window functions (no custom state needed).

    A session breaks when the whole-second gap to the previous event of the
    same user exceeds `gap_seconds`; `session_num` is 1-based per user in
    time order. Ordering key is (ts, event_id) — total, so the lag/sum
    windows are deterministic in any engine.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Parquet timestamps without tz info arrive as TIMESTAMP_NTZ, which has
    # no direct cast to numeric in Spark 4; route through TIMESTAMP_LTZ
    # (session tz is pinned to UTC, so the mapping is stable and gap
    # differences are exact either way).
    sec: Column = F.col("ts").cast("timestamp_ltz").cast("long")
    lag_sec = F.lag(sec).over(w)
    new_s = F.when(
        lag_sec.isNull() | ((sec - lag_sec) > gap_seconds), 1
    ).otherwise(0)
    numbered = events.select("user_id", "ts", "event_id").withColumn(
        "session_num",
        F.sum(new_s).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return numbered.groupBy("user_id", "session_num").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def _sessionize_fn(gap_us: int):
    """Builds the applyInPandasWithState function for one gap setting."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
           ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []  # (start_us, last_us, n)

        if state.hasTimedOut:
            if state.exists:
                closed.append(tuple(state.get))
                state.remove()
        else:
            cur = list(state.get) if state.exists else None
            ts_us: list[int] = []
            for pdf in pdfs:
                # pandas reads the TimestampType column as datetime64[ns|us].
                ts_us.extend(
                    int(v) // 1000
                    for v in pdf["ts"].astype("datetime64[ns]").astype("int64")
                )
            ts_us.sort()
            for t in ts_us:
                if cur is None:
                    cur = [t, t, 0]
                elif t - cur[1] > gap_us:
                    closed.append(tuple(cur))
                    cur = [t, t, 0]
                cur[1] = max(cur[1], t)
                cur[2] += 1
            if cur is not None:
                state.update(tuple(cur))
                # Flush once event time passes the inactivity horizon.
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_us // 1000)

        if closed:
            yield pd.DataFrame({
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [n for _, _, n in closed],
            })

    return fn


def sessionize_stream(events: DataFrame, watermark: str = "2 hours",
                      gap_seconds: int = DEFAULT_GAP_SECONDS) -> DataFrame:
    """Streaming sessionization: one GroupState row per active user.

    `events` is a streaming DataFrame with at least (user_id, ts). Emits one
    row per CLOSED session (append semantics): closed inline when a later
    event exceeds the gap, or by event-time timeout when the watermark
    passes `last_event + gap`.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_seconds * 1_000_000),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
