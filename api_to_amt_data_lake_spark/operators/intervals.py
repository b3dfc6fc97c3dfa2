"""Interval set algebra: union-merge overlapping spans per key.

Total covered time ("how many distinct seconds was this user active?")
cannot be summed per row — overlaps double-count — and the naive fix
is a quadratic self-join. The classic linear form: sort spans by
start, mark a span as opening a NEW segment iff its start exceeds the
running max end of everything before it, prefix-sum the marks into
segment ids, then one groupBy((key, segment)) for the merged spans.
Both windows share one partition+order (a single shuffle), running
max/sum are O(1) state per row, and the segment groupBy partial-
aggregates — the shape that survives a 100× scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merged (non-overlapping) spans per key: (keys…, seg_start,
    seg_end), where touching spans (next.start == prev.end) merge —
    half-open [s, e) semantics. Ordering ties (identical (s, e) rows)
    are safe: duplicates never open a segment regardless of which the
    window visits first, so the merged output is order-invariant."""
    w = (Window.partitionBy(*key_cols)
         .orderBy(F.col(start_col), F.col(end_col)))
    prev_max_end = (F.max(end_col)
                    .over(w.rowsBetween(Window.unboundedPreceding, -1)))
    opens = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end),
        F.lit(1)).otherwise(F.lit(0))
    seg = (
        df.withColumn("_open", opens)
        .withColumn("_seg", F.sum("_open").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        seg.groupBy(*key_cols, "_seg")
        .agg(F.min(start_col).alias("seg_start"),
             F.max(end_col).alias("seg_end"))
        .drop("_seg")
    )


def interval_coverage(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Total covered length and merged-segment count per key:
    (keys…, covered, n_segments). `covered` is Σ(seg_end − seg_start)
    over the union-merged spans, so overlaps count once."""
    merged = merge_intervals(df, key_cols, start_col, end_col)
    return (
        merged.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.sum(F.col("seg_end") - F.col("seg_start"))
             .alias("covered"),
             F.count(F.lit(1)).alias("n_segments"))
    )
