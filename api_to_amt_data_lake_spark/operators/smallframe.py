"""Ordered computations over SMALL bounded frames without WindowExec.

Several operators end with an ordered pass over a frame that is bounded
by construction — a 256-row shuffle-bucket count table, a per-block
total table, a top-50 ranked list, one row per month. A
`Window.partitionBy(F.lit(0))` expresses that correctly, but Catalyst
folds the constant partition key away and WindowExec then logs
"No Partition Defined ... Moving all data to a single partition" — a
warning that is noise for a 256-row frame but a genuine scale alarm
anywhere else, so letting it fire at all makes the real alarms
invisible (and invites copying the pattern somewhere unbounded).

These helpers replace that shape: pack the bounded frame into ONE row
(`collect_list` → `array_sort`), then explode it back and fold each
prefix with `F.aggregate` — O(n²) work inside whole-stage codegen,
trivial for n ≤ a few thousand, and zero WindowExec nodes in the plan
(asserted by tests/test_plan_audit.py over every registered query).
The single-task stage is still single-task — that is inherent to a
global order — but it now holds exactly one packed row, and the plan
says so.

Callers MUST only pass frames that are bounded by construction (an
aggregation over a fixed bucket space, a `limit(k)` result): the packed
row materializes the whole frame on one executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _packed(df: DataFrame, key_col: str, value_cols: list[str],
            descending: bool) -> DataFrame:
    """One-row frame holding the input sorted by key: `_a` is an
    array<struct> whose FIRST field is the key, so `array_sort`'s
    lexicographic struct order is exactly key order (keys are unique —
    these frames come out of a groupBy on the key)."""
    arr = F.array_sort(F.collect_list(F.struct(
        F.col(key_col).alias("k"),
        *[F.col(c).alias(c) for c in value_cols],
    )))
    if descending:
        arr = F.reverse(arr)
    return df.agg(arr.alias("_a"))


def exclusive_prefix_sums(
    df: DataFrame, key_col: str, sums: dict[str, str],
    descending: bool = False,
) -> DataFrame:
    """For each key (ordered ascending, or descending when asked), the
    running total of each `sums` column over all STRICTLY EARLIER keys
    — the exclusive prefix sum a `rowsBetween(unboundedPreceding, -1)`
    window would produce, minus the WindowExec. `sums` maps input
    column -> output column; results are LONG. Output: one row per
    input row, (key, *outputs)."""
    packed = _packed(df, key_col, list(sums), descending)

    def _fold(c):  # bind c by closure: pyspark reads lambda arity
        return lambda acc, x: acc + x[c].cast("long")

    prefix = {
        out: F.aggregate(
            F.slice("_a", F.lit(1), F.col("_pos")),
            F.lit(0).cast("long"), _fold(col),
        ).alias(out)
        for col, out in sums.items()
    }
    return (
        packed.select("_a", F.posexplode("_a").alias("_pos", "_s"))
        .select(F.col("_s.k").alias(key_col), *prefix.values())
    )


def ordered_rank_and_lag(
    df: DataFrame, order_cols: list[Column | str], keep_cols: list[str],
    lag_col: str | None = None,
) -> DataFrame:
    """Dense 1-based `rank` (and optionally `_prev_<lag_col>`, the
    previous row's value) over a bounded frame ordered by `order_cols`
    — `row_number()`/`lag()` over a global order, minus the WindowExec.

    `order_cols` become the leading struct fields driving the sort
    (pass already-negated columns for descending order); `keep_cols`
    ride along and come back as output columns.
    """
    fields = [
        (c if isinstance(c, Column) else F.col(c)).alias(f"_o{i}")
        for i, c in enumerate(order_cols)
    ]
    packed = df.agg(F.array_sort(F.collect_list(F.struct(
        *fields, *[F.col(c).alias(c) for c in keep_cols]))).alias("_a"))
    cols = [F.col(f"_s.{c}").alias(c) for c in keep_cols]
    cols.append((F.col("_pos") + 1).cast("long").alias("rank"))
    if lag_col is not None:
        # F.get is 0-based and null-safe at -1 — exactly lag(1)'s
        # first-row-null semantics.
        cols.append(F.get("_a", F.col("_pos") - 1)[lag_col]
                    .alias(f"_prev_{lag_col}"))
    return (
        packed.select("_a", F.posexplode("_a").alias("_pos", "_s"))
        .select(*cols)
    )
