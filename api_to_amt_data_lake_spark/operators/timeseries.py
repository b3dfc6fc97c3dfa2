"""Time-series drift statistics as window algebra.

The one-sided CUSUM statistic S_n = max(0, S_{n-1} + x_n − k) looks
irreducibly recursive — the reason streaming systems implement it as
per-key imperative state. It is not: with P_n = Σ_{i≤n} x_i and
Q_n = P_n − k·n,

    S_n = Q_n − min(0, Q_1, …, Q_n)

(unrolling the recursion, S_n = max over j ≤ n of P_n − P_j − k(n−j),
maximized at the j minimizing Q_j, with j = 0 contributing the 0
floor). So the detector is two running windows over one (key, order)
sort — a cumulative sum and a running min — O(1) state per row, one
shuffle, exact, and expressible identically in any SQL engine. No
Python state machine, no recursion, no approximation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cusum_drift(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str | Column],
    value_col: str,
    drift_k: float,
    threshold_h: float,
) -> DataFrame:
    """Per-row one-sided CUSUM upward-drift statistic and breach flag.

    `drift_k` is the allowed slack per observation (the classic choice
    is half the shift worth detecting, in value units above the
    in-control mean — subtract the baseline from `value_col` upstream
    if it is not already centered); `threshold_h` is the alarm level.
    Output: input rows + (cusum, breach). Deterministic under ties iff
    `order_cols` is a total order per key — pass an id tiebreaker.

    Plan: one shuffle on the key; both windows (cumsum, running min)
    share its sort. The running min carries Q's floor forward, so the
    statistic RESETS after sustained low values exactly like the
    recursive form — parity with a per-row Python fold is pinned in
    tests/test_round9_ops.py on random walks."""
    w = (Window.partitionBy(*key_cols).orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, 0))
    rn = F.count(F.lit(1)).over(w)
    q = F.sum(F.col(value_col)).over(w) - F.lit(float(drift_k)) * rn
    out = df.withColumn("_q", q)
    run_min = F.min("_q").over(w)
    cusum = F.col("_q") - F.least(F.lit(0.0), run_min)
    return (
        out.withColumn("cusum", cusum)
        .withColumn("breach", (F.col("cusum") > F.lit(float(threshold_h)))
                    .cast("boolean"))
        .drop("_q")
    )
