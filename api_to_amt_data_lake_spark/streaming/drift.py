"""Streaming drift detection: per-key CUSUM alarms (the recursion a live
stream needs custom state for) and tumbling-window histograms for
distribution drift / PSI monitoring (`stream_binned_counts` — pure
built-in windowed aggregation, no custom state).

Batch CUSUM de-recursifies into window algebra
(`operators/timeseries.py::cusum_drift` — cumsum + running min), but a
LIVE detector must carry S_n across micro-batch boundaries, which is
exactly the one-cell-per-key cross-batch state arbitrary-state APIs
exist for. Implemented on `applyInPandasWithState` (GroupState, the
same API as `budget.py`): state = the running statistic, each batch
folds its rows in (order_col…) order and emits every row's statistic +
breach flag.

Ordering contract: the fold applies rows in order WITHIN a batch and
batches in arrival order — the statistic is exact when micro-batches
respect per-key event-time order (a log tail); rows arriving after a
later batch fold at their arrival position, the standard live-detector
semantics (the batch binding is the replayable ground truth).

Scale shape: state is ONE double per key; Arrow batches stream through
the Python worker; the groupBy partitions by key — no skew beyond the
key distribution itself.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

CUSUM_OUTPUT_SCHEMA = ("key string, event_id long, cusum double, "
                       "breach boolean")
_STATE_SCHEMA = "s double"


def _cusum_fn(drift_k: float, threshold_h: float, order_cols: list[str]):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
           ) -> Iterator[pd.DataFrame]:
        s = state.get[0] if state.exists else 0.0
        for pdf in pdfs:
            pdf = pdf.sort_values(order_cols)
            out_c, out_b = [], []
            for v in pdf["value"]:
                s = max(0.0, s + float(v) - drift_k)
                out_c.append(s)
                out_b.append(s > threshold_h)
            yield pd.DataFrame({
                "key": key[0],
                "event_id": pdf["event_id"].values,
                "cusum": out_c,
                "breach": out_b,
            })
        state.update((s,))

    return fn


def stream_cusum(
    stream_df: DataFrame,
    drift_k: float,
    threshold_h: float,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming per-key CUSUM. Input stream columns:
    (key string, event_id long, ts_us long, value double); output one
    row per input row with the running statistic and breach flag."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream_df.groupBy("key")
        .applyInPandasWithState(
            _cusum_fn(float(drift_k), float(threshold_h),
                      order_cols or ["ts_us", "event_id"]),
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_binned_counts(
    stream_df: DataFrame,
    width_df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    bins: int = 10,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window histogram of a live value stream — the streaming
    half of distribution-drift monitoring (`operators/corpus.py::
    psi_drift` is the batch form; the PSI assembly against a static
    reference histogram happens downstream of the sink, where all of a
    window's bins are final).

    ``width_df`` is a ONE-ROW static frame carrying the bin width as
    ``_w`` (derived from the reference snapshot — e.g.
    ``ref.agg((F.max(v) / bins).alias("_w"))``); it reaches the stream
    through a stream-static broadcast join on a constant key, so the
    configuration stays a lazy plan, never a driver collect. Values are
    clamped into the top bin (out-of-reference-range mass is exactly
    what drift monitoring must see).

    Output (append mode, emitted once the event-time watermark passes a
    window's end): ``window_start, window_end, bin, n_cur``. State is
    O(open windows × bins) — bounded by the watermark horizon, never by
    stream volume; counts partial-aggregate map-side per micro-batch."""
    from pyspark.sql import functions as F

    binned = (
        stream_df.withColumn("_one", F.lit(1))
        .join(F.broadcast(width_df.withColumn("_one", F.lit(1))), "_one")
        .select(
            F.col(ts_col),
            F.least(
                F.lit(bins - 1).cast("long"),
                F.floor(F.col(value_col) / F.col("_w")),
            ).alias("bin"),
        )
    )
    return (
        binned.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), "bin")
        .agg(F.count(F.lit(1)).alias("n_cur"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "bin", "n_cur",
        )
    )


def stream_value_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window DISTINCT-VALUE histogram of a live stream — the
    unbinned sibling of `stream_binned_counts`, feeding EXACT
    distribution tests downstream: from per-(window, value) counts a
    batch consumer assembles the precise empirical CDF of every closed
    window, so the two-sample Kolmogorov–Smirnov statistic against a
    reference snapshot (`operators/corpus.py::ks_drift`'s algebra) is
    exact, not a binned approximation — PSI tells you THAT mass moved
    between coarse bins; KS on the true CDF tells you the largest
    distributional gap and WHERE it sits.

    Use on discrete or quantized value domains (status codes, token
    counts, rounded latencies): state is O(open windows × distinct
    values), bounded by the watermark horizon times value cardinality
    — for continuous raw doubles, quantize first or use
    `stream_binned_counts`. Counts partial-aggregate map-side per
    micro-batch; emission is append-mode on watermark close.
    Output: window_start, window_end, value, n_cur."""
    from pyspark.sql import functions as F

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"),
                 F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n_cur"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "value", "n_cur",
        )
    )
