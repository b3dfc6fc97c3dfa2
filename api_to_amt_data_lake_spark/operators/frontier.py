"""Pareto frontier (2-D skyline) as a sort-sweep, not a self-join.

The textbook skyline — rows not dominated by any other row — is a
quadratic NOT EXISTS self-join as written. In 2-D it collapses to a
linear sweep: after reducing to the best y per distinct x, sort by x
ascending; a point is on the frontier iff its y strictly beats the
running max of every cheaper point. That is one partial-aggregated
groupBy plus one window over the group — two shuffles on the group
key, zero self-joins, and the window's running max is O(1) state per
row, so the sweep holds at any cardinality. (The reference has no
skyline operator; this is part of the curation surface — e.g. "best
quality-per-cost documents" selection.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    minimize_x: bool = True,
    maximize_y: bool = True,
) -> DataFrame:
    """Rows on the (x, y) Pareto frontier per group: no other row in
    the group is at-least-as-good on both axes and strictly better on
    one. Directions default to minimize x / maximize y; other
    quadrants negate the respective axis (handled here so callers
    state intent, not sign tricks).

    Plan shape: groupBy(group, x).max(y) first — the per-x reduction
    makes later rows in the sweep STRICTLY worse on x, so the window
    compare needs no tie handling — then one running max over the
    group ordered by x. Output columns: group_cols + [x_col, y_col].

    Scale: the per-x reduction partial-aggregates map-side; the window
    partitions by the group, so no single-partition sort unless the
    caller asks for a global (ungrouped) skyline — there the per-x
    reduction has already cut the input to |distinct x| rows.
    """
    group_cols = group_cols or []
    xs = F.col(x_col) if minimize_x else -F.col(x_col)
    best_y = (F.max(y_col) if maximize_y else F.min(y_col)).alias(y_col)
    per_x = df.groupBy(*group_cols, x_col).agg(best_y)
    w = (
        Window.partitionBy(*group_cols).orderBy(xs)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (F.max(y_col) if maximize_y else F.min(y_col)).over(w)
    prev = F.col("_run")
    better = (F.col(y_col) > prev) if maximize_y else (F.col(y_col) < prev)
    return (
        per_x.withColumn("_run", run)
        .filter(prev.isNull() | better)
        .drop("_run")
    )
