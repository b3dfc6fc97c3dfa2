"""Slowly-changing-dimension type 2 history (beyond reference scope).

The reference rebuilds every dimension from scratch each run
(`parquet/amt_parquet.py:27-36`), so attribute history is lost — a
student's school change overwrites the old row. SCD2 is the standard
warehouse answer: one row per (key, attribute-state) interval with
`valid_from` / `valid_to` / `is_current`, new intervals opened when any
tracked attribute changes.

Two operators:

- :func:`scd2_from_events` — build the full history from a log of
  observations (key, observed_at, attrs...): collapse consecutive
  duplicate states per key, then derive each surviving state's validity
  interval from the NEXT state's start (lead window). This is the
  batch/backfill path: two narrow window passes over data partitioned
  by key, no self-join.
- :func:`scd2_apply` — fold one day's current snapshot into an existing
  SCD2 table: close intervals whose attributes changed, append the new
  states, carry everything else. The join is per-key on the CURRENT
  rows only (history rows pass through untouched), so cost tracks the
  dimension's current size, never its history length.

Scale shape: `scd2_from_events` is lag/lead windows partitioned by the
natural key — Spark's window exchange is one shuffle on the key and
never a global sort. `scd2_apply` is one equi-join of current rows vs
the snapshot (both sides keyed; broadcast when the dimension is small)
plus a union. At 100 TB the history table should be bucketed on the
key (`sources/parquet_io.py::write_view_bucketed`) so the apply path
reads co-located buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

OPEN_END = "9999-12-31"


def _state_changed(attrs: Sequence[str], w) -> Column:
    """True when any tracked attribute differs from the previous
    observation of the same key (null-safe: NULL -> value counts as a
    change, first observation always opens an interval)."""
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.lag(F.col(a)).over(w).eqNullSafe(F.col(a))
    return F.when(F.row_number().over(w) == 1, F.lit(True)) \
        .otherwise(changed)


def scd2_from_events(
    events: DataFrame, key_col: str, ts_col: str, attrs: Sequence[str],
) -> DataFrame:
    """Full SCD2 history from an observation log.

    `events` has one row per observation (key, ts, attrs...); repeated
    observations of an unchanged state collapse into one interval. Each
    interval runs from its first observation to the day the NEXT
    distinct state appears (exclusive upper bound by convention:
    `valid_to` equals the next `valid_from`; the last state is open,
    `valid_to` = 9999-12-31, `is_current` = true). Ties on `ts_col` are
    broken by the attribute values themselves so the result is
    deterministic under any partitioning.
    """
    order = [F.col(ts_col).asc()] + [F.col(a).asc_nulls_first()
                                     for a in attrs]
    w = Window.partitionBy(key_col).orderBy(*order)
    opened = (
        events.select(key_col, ts_col, *attrs)
        .withColumn("_open", _state_changed(attrs, w))
        .filter(F.col("_open"))
        .drop("_open")
    )
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (
        opened
        .withColumn("valid_from", F.col(ts_col))
        .withColumn(
            "valid_to",
            F.coalesce(F.lead(F.col(ts_col)).over(w2),
                       F.lit(OPEN_END).cast(
                           dict(events.dtypes)[ts_col])))
        .withColumn("is_current",
                    F.lead(F.col(ts_col)).over(w2).isNull())
        .drop(ts_col)
        .select(key_col, *attrs, "valid_from", "valid_to", "is_current")
    )


def scd2_apply(
    history: DataFrame, snapshot: DataFrame, key_col: str,
    attrs: Sequence[str], as_of, partial: bool = False,
) -> DataFrame:
    """Fold a current snapshot (one row per key) into an SCD2 table.

    - keys whose attributes match their current interval: unchanged;
    - changed keys: the current interval closes at `as_of` and a new
      current interval (valid_from = as_of) opens with the new state;
    - brand-new keys: a first current interval opens at `as_of`;
    - keys absent from the snapshot: with `partial=False` (a FULL
      snapshot) their interval closes at `as_of` — the member was
      deleted; with `partial=True` (a CDC/stream micro-batch, which
      only carries the keys that changed) they pass through untouched.
    History (non-current) rows are never touched or shuffled beyond
    the initial filter — the join covers current rows only.
    """
    cur = history.filter(F.col("is_current"))
    old = history.filter(~F.col("is_current"))
    snap = snapshot.select(
        F.col(key_col), *[F.col(a).alias(f"_new_{a}") for a in attrs])

    same = F.lit(True)
    for a in attrs:
        same = same & F.col(a).eqNullSafe(F.col(f"_new_{a}"))
    # Presence flags must not depend on attribute nullability (a key
    # whose every tracked attr is NULL still exists): dedicated markers.
    joined = cur.withColumn("_in_cur", F.lit(True)).join(
        snap.withColumn("_in_snap", F.lit(True)), key_col, "full_outer")
    in_cur = F.col("_in_cur").isNotNull()
    in_snap = F.col("_in_snap").isNotNull()

    absent_closes = F.lit(not partial) & ~in_snap
    unchanged = joined.filter(
        in_cur & ((in_snap & same) | (F.lit(partial) & ~in_snap))).select(
        key_col, *attrs, "valid_from", "valid_to", "is_current")
    closed = joined.filter(in_cur & ((in_snap & ~same) | absent_closes)) \
        .select(
        F.col(key_col), *attrs,
        F.col("valid_from"),
        F.lit(as_of).cast(dict(history.dtypes)["valid_to"])
        .alias("valid_to"),
        F.lit(False).alias("is_current"))
    opened = joined.filter(in_snap & (~in_cur | ~same)).select(
        F.col(key_col),
        *[F.col(f"_new_{a}").alias(a) for a in attrs],
        F.lit(as_of).cast(dict(history.dtypes)["valid_from"])
        .alias("valid_from"),
        F.lit(OPEN_END).cast(dict(history.dtypes)["valid_to"])
        .alias("valid_to"),
        F.lit(True).alias("is_current"))
    return old.unionByName(unchanged).unionByName(closed) \
        .unionByName(opened)


def scd2_as_of(history: DataFrame, at) -> DataFrame:
    """Point-in-time view: the state of every key at timestamp `at`
    (valid_from <= at < valid_to) — the query pattern SCD2 exists for.
    A sargable range filter, no window, no join."""
    return history.filter(
        (F.col("valid_from") <= F.lit(at)) & (F.lit(at) < F.col("valid_to")))
