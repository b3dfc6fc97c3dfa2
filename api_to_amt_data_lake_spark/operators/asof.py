"""Backward as-of join — an operator the reference lacks (its only
non-equi shape is interval containment, SURVEY.md §2.3 J7) but that any
event/feature pipeline at scale needs: "for each left event, the most
recent right observation at or before it".

The naive formulation (equi-join on key, filter right_ts <= left_ts, then
max-per-left-row) explodes to |left| x |right-per-key| intermediate rows —
quadratic in the per-key event count. This implementation is linear: union
both sides into one stream, sort within each key by (ts, side) — right
rows ahead of left rows at equal timestamps, matching ASOF `>=` semantics
— and carry the right-side values forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window. One
shuffle on the key, one per-key sort, no fanout; per-key skew is bounded
by the same sort a sort-merge join would need anyway.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "_asof_ts"
_SIDE = "_asof_side"
_MATCH = "_asof_match_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "left",
    tolerance_seconds: int | None = None,
    matched_ts_col: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each `left` row, attach the `right` row with the greatest
    ``right_ts <= left_ts`` sharing the `on` keys (ties at equal timestamps
    match, as in ``ASOF JOIN ... ON l.ts >= r.ts``).

    - `on`: equi-key column names present in BOTH frames.
    - Non-key `right` columns must not collide with `left` column names.
    - `right` must be unique per (`on`, `right_ts`) — pre-aggregate
      otherwise; with duplicates the carried value is tie-broken
      arbitrarily.
    - `how`: 'left' keeps unmatched left rows (right values null);
      'inner' drops them.
    - `tolerance_seconds`: nulls out matches older than
      ``left_ts - tolerance`` (and drops the row under 'inner').
    - `matched_ts_col`: optionally expose the matched right timestamp.
    - `direction`: 'backward' (default — most recent right at or before),
      'forward' (earliest right at or after), or 'nearest' (whichever
      of the two is closest in time; equidistant ties resolve BACKWARD,
      matching pandas ``merge_asof(direction='nearest')``); tolerance
      bounds the match's distance in the chosen direction(s). Same plan
      for all three: one shuffle on the key, ONE per-key sort — nearest
      evaluates both carry frames inside the same WindowExec and picks
      per row, it never joins twice.
    """
    if direction == "nearest":
        return _asof_nearest(left, right, on, left_ts, right_ts, how,
                             tolerance_seconds, matched_ts_col)
    if direction not in ("backward", "forward"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest', "
            f"got {direction!r}")
    fwd = direction == "forward"
    on = list(on)
    key_set = set(on)
    payload = [c for c in left.columns if c not in key_set]
    rvals = [c for c in right.columns if c not in key_set and c != right_ts]
    clash = set(rvals) & set(payload)
    if clash:
        raise ValueError(f"right value columns collide with left: {sorted(clash)}")

    def null_like(df: DataFrame, name: str) -> Column:
        return F.lit(None).cast(df.schema[name].dataType).alias(name)

    l2 = left.select(
        *on,
        *payload,
        *[null_like(right, c) for c in rvals],
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
    )
    # Side ordering places right rows on the INCLUSIVE side of ties:
    # backward → right before left (0 < 1) in a preceding frame;
    # forward → right after left (2 > 1) in a following frame.
    right_side = 2 if fwd else 0
    r2 = right.select(
        *on,
        *[null_like(left, c) for c in payload],
        *rvals,
        F.col(right_ts).alias(_TS),
        F.lit(right_side).alias(_SIDE),
    )

    w = Window.partitionBy(*on).orderBy(_TS, _SIDE)
    if fwd:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry = F.first
    else:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry = F.last
    carried = l2.unionByName(r2).select(
        *on,
        *payload,
        *[carry(c, ignorenulls=True).over(w).alias(c) for c in rvals],
        carry(F.when(F.col(_SIDE) == right_side, F.col(_TS)),
              ignorenulls=True)
        .over(w)
        .alias(_MATCH),
        F.col(_SIDE),
    )
    out = carried.filter(F.col(_SIDE) == 1).drop(_SIDE)

    if tolerance_seconds is not None:
        if fwd:
            in_tol = F.col(_MATCH).cast("long") <= (
                F.col(left_ts).cast("long") + F.lit(tolerance_seconds)
            )
        else:
            in_tol = F.col(_MATCH).cast("long") >= (
                F.col(left_ts).cast("long") - F.lit(tolerance_seconds)
            )
        out = out.select(
            *on,
            *payload,
            *[F.when(in_tol, F.col(c)).alias(c) for c in rvals],
            F.when(in_tol, F.col(_MATCH)).alias(_MATCH),
        )
    if how == "inner":
        out = out.filter(F.col(_MATCH).isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")

    if matched_ts_col is not None:
        return out.withColumnRenamed(_MATCH, matched_ts_col)
    return out.drop(_MATCH)


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    how: str,
    tolerance_seconds: int | None,
    matched_ts_col: str | None,
) -> DataFrame:
    """direction='nearest': both the backward carry (last over the
    preceding frame) and the forward carry (first over the following
    frame) are window expressions over ONE partition+sort — Spark
    evaluates them in a single WindowExec, so nearest costs the same
    one shuffle + one sort as either one-sided variant. Per left row
    the closer match wins; equidistant ties resolve backward (right
    rows sort before left rows at equal timestamps, so a distance-0
    backward match always exists to win the tie — pandas semantics)."""
    on = list(on)
    key_set = set(on)
    payload = [c for c in left.columns if c not in key_set]
    rvals = [c for c in right.columns if c not in key_set and c != right_ts]
    clash = set(rvals) & set(payload)
    if clash:
        raise ValueError(
            f"right value columns collide with left: {sorted(clash)}")

    def null_like(df: DataFrame, name: str) -> Column:
        return F.lit(None).cast(df.schema[name].dataType).alias(name)

    l2 = left.select(
        *on, *payload, *[null_like(right, c) for c in rvals],
        F.col(left_ts).alias(_TS), F.lit(1).alias(_SIDE))
    r2 = right.select(
        *on, *[null_like(left, c) for c in payload], *rvals,
        F.col(right_ts).alias(_TS), F.lit(0).alias(_SIDE))
    base = Window.partitionBy(*on).orderBy(_TS, _SIDE)
    w_b = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_f = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    r_ts = F.when(F.col(_SIDE) == 0, F.col(_TS))
    carried = l2.unionByName(r2).select(
        *on, *payload, F.col(_TS), F.col(_SIDE),
        *[F.last(c, ignorenulls=True).over(w_b).alias(f"_b_{c}")
          for c in rvals],
        *[F.first(c, ignorenulls=True).over(w_f).alias(f"_f_{c}")
          for c in rvals],
        F.last(r_ts, ignorenulls=True).over(w_b).alias("_b_ts"),
        F.first(r_ts, ignorenulls=True).over(w_f).alias("_f_ts"),
    ).filter(F.col(_SIDE) == 1)
    # Distance arithmetic needs a numeric image of the ts column;
    # TIMESTAMP_NTZ refuses a direct long cast, and second-truncating
    # casts would mis-rank sub-second gaps — exact microseconds for any
    # timestamp flavor, plain long for numeric event-time columns.
    ts_type = dict(left.dtypes)[left_ts]
    if ts_type.startswith("timestamp"):
        def to_num(c):
            return F.unix_micros(c.cast("timestamp_ltz"))
        tol_num = (None if tolerance_seconds is None
                   else tolerance_seconds * 1_000_000)
    else:
        def to_num(c):
            return c.cast("long")
        tol_num = tolerance_seconds
    l_us = to_num(F.col(_TS))
    d_b = l_us - to_num(F.col("_b_ts"))
    d_f = to_num(F.col("_f_ts")) - l_us
    pick_back = F.col("_f_ts").isNull() | (
        F.col("_b_ts").isNotNull() & (d_b <= d_f))
    chosen = F.when(pick_back, F.col("_b_ts")).otherwise(F.col("_f_ts"))
    in_tol = (F.lit(True) if tol_num is None else
              F.abs(to_num(chosen) - l_us) <= tol_num)
    out = carried.select(
        *on, *payload,
        *[F.when(in_tol,
                 F.when(pick_back, F.col(f"_b_{c}"))
                 .otherwise(F.col(f"_f_{c}"))).alias(c) for c in rvals],
        F.when(in_tol, chosen).alias(_MATCH),
    )
    if how == "inner":
        out = out.filter(F.col(_MATCH).isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if matched_ts_col is not None:
        return out.withColumnRenamed(_MATCH, matched_ts_col)
    return out.drop(_MATCH)


def resample_locf(
    df: DataFrame, key_col: str, ts_col: str, value_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Regular-grid resampling with last-observation-carried-forward —
    the gap-filling step feature pipelines run before as-of joins or
    model training: one row per `unit` slot per key between the key's
    first and last observation, carrying the latest value forward
    through empty slots. Output: (key, slot, value).

    Plan shape: one groupBy(key, slot) reduces the raw events to at
    most one row per slot map-side (deterministic within-slot winner:
    max over (ts, value) — latest timestamp, value as tiebreak); the
    grid materializes via sequence+explode from each key's (min, max)
    bounds — generated, never shuffled; the carry-forward is one
    last(ignorenulls) window PARTITIONED BY KEY (bounded per-key state,
    the same shape `asof_join` uses). Nothing global, nothing
    driver-side; per-key slot counts are span/unit — callers resampling
    years at second granularity should pick a coarser unit, same as any
    resampler.
    """
    if unit not in ("minute", "hour", "day", "week", "month"):
        raise ValueError(f"resample unit {unit!r} not supported "
                         f"(minute/hour/day/week/month)")
    slot = F.date_trunc(unit, F.col(ts_col))
    last_per_slot = (
        df.select(
            F.col(key_col), slot.alias("slot"),
            F.struct(F.col(ts_col).alias("ts"),
                     F.col(value_col).alias("v")).alias("_tv"),
        )
        .groupBy(key_col, "slot")
        .agg(F.max("_tv").alias("_m"))
        .select(key_col, "slot", F.col("_m.v").alias("_v"))
    )
    grid = (
        df.groupBy(key_col)
        .agg(F.min(slot).alias("_lo"), F.max(slot).alias("_hi"))
        .select(
            F.col(key_col),
            F.explode(F.sequence(
                F.col("_lo"), F.col("_hi"),
                F.expr(f"INTERVAL 1 {unit}"))).alias("slot"),
        )
    )
    w = (Window.partitionBy(key_col).orderBy(F.col("slot").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        grid.join(last_per_slot, [key_col, "slot"], "left")
        .select(key_col, "slot",
                F.last("_v", ignorenulls=True).over(w).alias(value_col))
    )
