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
    as_of_col: str | None = None,
) -> DataFrame:
    """Fold a current snapshot (one row per key) into an SCD2 table.

    - keys whose attributes match their current interval: unchanged;
    - changed keys: the current interval closes and a new current
      interval opens with the new state;
    - brand-new keys: a first current interval opens;
    - keys absent from the snapshot: with `partial=False` (a FULL
      snapshot) their interval closes at `as_of` — the member was
      deleted; with `partial=True` (a CDC/stream micro-batch, which
      only carries the keys that changed) they pass through untouched.

    Close/open times: scalar `as_of` for every key by default; with
    `as_of_col` set, that snapshot column supplies a PER-KEY
    observation time used as the changed key's close time and the new
    interval's `valid_from` (absent-key closes still use the scalar —
    absence carries no per-key time). With per-key times a LATE
    snapshot row (its time <= the key's current `valid_from`) is
    ignored — the history already reflects a newer state, and closing
    would mint an inverted interval.
    History (non-current) rows are never touched or shuffled beyond
    the initial filter — the join covers current rows only.
    """
    cur = history.filter(F.col("is_current"))
    old = history.filter(~F.col("is_current"))
    snap_cols = [F.col(key_col)] + [F.col(a).alias(f"_new_{a}")
                                    for a in attrs]
    if as_of_col is not None:
        snap_cols.append(F.col(as_of_col).alias("_new_ts"))
    snap = snapshot.select(*snap_cols)

    same = F.lit(True)
    for a in attrs:
        same = same & F.col(a).eqNullSafe(F.col(f"_new_{a}"))
    # Presence flags must not depend on attribute nullability (a key
    # whose every tracked attr is NULL still exists): dedicated markers.
    joined = cur.withColumn("_in_cur", F.lit(True)).join(
        snap.withColumn("_in_snap", F.lit(True)), key_col, "full_outer")
    in_cur = F.col("_in_cur").isNotNull()
    in_snap = F.col("_in_snap").isNotNull()

    to_t = dict(history.dtypes)["valid_to"]
    from_t = dict(history.dtypes)["valid_from"]
    if as_of_col is not None:
        close_at = F.col("_new_ts").cast(to_t)
        open_at = F.col("_new_ts").cast(from_t)
        late = in_cur & in_snap & F.coalesce(
            open_at <= F.col("valid_from"), F.lit(False))
    else:
        close_at = F.lit(as_of).cast(to_t)
        open_at = F.lit(as_of).cast(from_t)
        late = F.lit(False)

    absent_closes = F.lit(not partial) & ~in_snap
    unchanged = joined.filter(
        in_cur & ((in_snap & (same | late))
                  | (F.lit(partial) & ~in_snap))).select(
        key_col, *attrs, "valid_from", "valid_to", "is_current")
    closed = joined.filter(
        in_cur & ((in_snap & ~same & ~late) | absent_closes)).select(
        F.col(key_col), *attrs,
        F.col("valid_from"),
        F.when(~in_snap, F.lit(as_of).cast(to_t)).otherwise(close_at)
        .alias("valid_to"),
        F.lit(False).alias("is_current"))
    opened = joined.filter(in_snap & (~in_cur | (~same & ~late))).select(
        F.col(key_col),
        *[F.col(f"_new_{a}").alias(a) for a in attrs],
        open_at.alias("valid_from"),
        F.lit(OPEN_END).cast(to_t).alias("valid_to"),
        F.lit(True).alias("is_current"))
    return old.unionByName(unchanged).unionByName(closed) \
        .unionByName(opened)


def scd2_close_keys(
    history: DataFrame, closed_keys: DataFrame, key_col: str,
    as_of=None, as_of_col: str | None = None,
) -> DataFrame:
    """Close the current interval of every key in `closed_keys` — the
    TOMBSTONE path of CDC SCD2 maintenance (a delete event names the
    key; `scd2_apply(partial=True)` can't express it because absence
    means "no news" there).

    Close time is the scalar `as_of`, or per-key from `as_of_col` in
    `closed_keys`. A LATE tombstone (close time <= the current
    interval's `valid_from`) is ignored rather than minting an
    inverted interval. Keys with no current interval are no-ops.
    Same scale shape as `scd2_apply`: the join touches current rows
    only, history rows stream through the filter + union.
    """
    if as_of is None and as_of_col is None:
        # Without a close time `valid_from < NULL` is null → coalesced
        # to False → every tombstone silently dropped. Fail loudly.
        raise ValueError(
            "scd2_close_keys needs a close time: pass as_of or as_of_col")
    cur = history.filter(F.col("is_current"))
    old = history.filter(~F.col("is_current"))
    to_t = dict(history.dtypes)["valid_to"]
    cols = [F.col(key_col), F.lit(True).alias("_del")]
    if as_of_col is not None:
        cols.append(F.col(as_of_col).cast(to_t).alias("_del_ts"))
    dels = closed_keys.select(*cols).dropDuplicates([key_col])
    joined = cur.join(dels, key_col, "left_outer")
    close_at = (F.col("_del_ts") if as_of_col is not None
                else F.lit(as_of).cast(to_t))
    closes = F.coalesce(
        F.col("_del") & (F.col("valid_from") < close_at), F.lit(False))
    kept = joined.filter(~closes).select(
        *[c for c in history.columns])
    closed = joined.filter(closes).select(
        *[F.col(c) for c in history.columns if c not in
          ("valid_to", "is_current")],
        close_at.alias("valid_to"),
        F.lit(False).alias("is_current"),
    ).select(*history.columns)
    return old.unionByName(kept).unionByName(closed)


def scd2_as_of(history: DataFrame, at) -> DataFrame:
    """Point-in-time view: the state of every key at timestamp `at`
    (valid_from <= at < valid_to) — the query pattern SCD2 exists for.
    A sargable range filter, no window, no join."""
    return history.filter(
        (F.col("valid_from") <= F.lit(at)) & (F.lit(at) < F.col("valid_to")))
