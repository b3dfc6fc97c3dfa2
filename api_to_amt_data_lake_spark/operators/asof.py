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


def _ts_to_num(c: Column, dtype: str) -> Column:
    """Monotonic numeric image of an event-time column for distance /
    tolerance arithmetic. Timestamps map to exact MICROSECONDS: LTZ via
    unix_micros directly; NTZ from its own wall-clock fields — a cast
    through the session zone is NON-MONOTONIC across DST spring-forward
    gaps, and this is a library callable under any session timezone;
    DATE via unix_date. Numeric event-time columns pass through
    UNCHANGED — truncating a DOUBLE/DECIMAL event time to long would
    mis-rank sub-unit gaps and mis-filter tolerances."""
    if dtype == "timestamp":
        return F.unix_micros(c)
    if dtype == "timestamp_ntz":
        return (
            F.unix_date(c.cast("date")).cast("long") * F.lit(86_400_000_000)
            + (F.hour(c) * F.lit(3600) + F.minute(c) * F.lit(60)
               + F.second(c)).cast("long") * F.lit(1_000_000)
            + F.date_format(c, "SSSSSS").cast("long"))
    if dtype == "date":
        return F.unix_date(c).cast("long") * F.lit(86_400_000_000)
    return c


def _num_tolerance(tolerance_seconds: int | None, dtype: str) -> int | None:
    """tolerance_seconds in _ts_to_num units (µs for temporal types)."""
    if tolerance_seconds is None:
        return None
    if dtype.startswith("timestamp") or dtype == "date":
        return tolerance_seconds * 1_000_000
    return tolerance_seconds


def _asof_frames(left, right, on, left_ts, right_ts, right_side):
    """Shared prologue: column resolution + the mirrored union frames.
    The right side travels as ONE struct column (every right value
    plus the matched timestamp), so the window carry moves whole right
    ROWS atomically — per-column carries with ignorenulls would skip a
    right row's genuinely-NULL value and stitch an older row's value
    onto a newer match (pandas merge_asof returns the matched row's
    NULL, and so does this)."""
    from pyspark.sql import types as T

    on = list(on)
    key_set = set(on)
    reserved = sorted({c for c in (*left.columns, *right.columns)
                       if c.startswith("_asof_")})
    if reserved:
        # The union/window plumbing owns the _asof_ namespace (_asof_ts,
        # _asof_side, _asof_rs, _asof_m, _asof_mb, _asof_mf,
        # _asof_match_ts); an input column there would collide into
        # duplicate-column ambiguity or a silently wrong carry.
        raise ValueError(
            f"input columns use the reserved _asof_ prefix: {reserved}; "
            "rename them before the as-of join")
    payload = [c for c in left.columns if c not in key_set]
    rvals = [c for c in right.columns if c not in key_set and c != right_ts]
    clash = set(rvals) & set(payload)
    if clash:
        raise ValueError(
            f"right value columns collide with left: {sorted(clash)}")
    lt, rt = dict(left.dtypes)[left_ts], dict(right.dtypes)[right_ts]
    temporal = ("timestamp", "timestamp_ntz", "date")
    if (lt in temporal or rt in temporal) and lt != rt:
        # Mixed temporal types would decode the matched timestamp with
        # the wrong _ts_to_num branch (a DATE routed through unix_micros
        # or vice versa) — require the caller to cast one side.
        raise ValueError(
            f"left_ts type {lt!r} and right_ts type {rt!r} differ; "
            "cast them to one type before the as-of join")
    rs_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in rvals]
        + [T.StructField(_MATCH, right.schema[right_ts].dataType)])
    l2 = left.select(
        *on, *payload,
        F.lit(None).cast(rs_type).alias("_asof_rs"),
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE))
    r2 = right.select(
        *on,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in payload],
        F.struct(*[right[c] for c in rvals],
                 right[right_ts].alias(_MATCH)).alias("_asof_rs"),
        F.col(right_ts).alias(_TS),
        F.lit(right_side).alias(_SIDE))
    return on, payload, rvals, l2.unionByName(r2)


def _asof_finish(out: DataFrame, how: str,
                 matched_ts_col: str | None) -> DataFrame:
    if how == "inner":
        out = out.filter(F.col(_MATCH).isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if matched_ts_col is not None:
        return out.withColumnRenamed(_MATCH, matched_ts_col)
    return out.drop(_MATCH)


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
    - Column names starting with ``_asof_`` are RESERVED for the
      operator's internals on both inputs (a clear ValueError, not a
      silent mis-carry).
    - `right` must be unique per (`on`, `right_ts`) — pre-aggregate
      otherwise; with duplicates the carried value is tie-broken
      arbitrarily.
    - `how`: 'left' keeps unmatched left rows (right values null);
      'inner' drops them.
    - `tolerance_seconds`: nulls out matches farther than the tolerance
      in the match direction (and drops the row under 'inner').
      Timestamp/date columns measure in real time; numeric event-time
      columns measure in their own units.
    - `matched_ts_col`: optionally expose the matched right timestamp.
    - `direction`: 'backward' (default — most recent right at or before),
      'forward' (earliest right at or after), or 'nearest' (whichever
      of the two is closest in time; equidistant ties resolve BACKWARD,
      matching pandas ``merge_asof(direction='nearest')``). Same plan
      for all three: one shuffle on the key, ONE per-key sort — the
      matched right row travels as a struct (atomic: a NULL value in
      the matched row stays NULL, never replaced by an older row's),
      and nearest evaluates both carry frames inside the same
      WindowExec, never joining twice.
    """
    if direction == "nearest":
        return _asof_nearest(left, right, on, left_ts, right_ts, how,
                             tolerance_seconds, matched_ts_col)
    if direction not in ("backward", "forward"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest', "
            f"got {direction!r}")
    fwd = direction == "forward"
    # Side ordering places right rows on the INCLUSIVE side of ties:
    # backward -> right before left (0 < 1) in a preceding frame;
    # forward -> right after left (2 > 1) in a following frame.
    on, payload, rvals, unioned = _asof_frames(
        left, right, on, left_ts, right_ts, 2 if fwd else 0)

    w = Window.partitionBy(*on).orderBy(_TS, _SIDE)
    if fwd:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry = F.first
    else:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry = F.last
    carried = unioned.select(
        *on, *payload,
        carry("_asof_rs", ignorenulls=True).over(w).alias("_asof_m"),
        F.col(_SIDE),
    ).filter(F.col(_SIDE) == 1)

    ts_type = dict(left.dtypes)[left_ts]
    tol = _num_tolerance(tolerance_seconds, ts_type)
    if tol is not None:
        l_num = _ts_to_num(F.col(left_ts), ts_type)
        m_num = _ts_to_num(F.col("_asof_m").getField(_MATCH), ts_type)
        in_tol = ((m_num <= l_num + tol) if fwd
                  else (m_num >= l_num - tol))
    else:
        in_tol = F.lit(True)
    out = carried.select(
        *on, *payload,
        *[F.when(in_tol, F.col("_asof_m").getField(c)).alias(c) for c in rvals],
        F.when(in_tol, F.col("_asof_m").getField(_MATCH)).alias(_MATCH),
    )
    return _asof_finish(out, how, matched_ts_col)


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
    on, payload, rvals, unioned = _asof_frames(
        left, right, on, left_ts, right_ts, 0)
    base = Window.partitionBy(*on).orderBy(_TS, _SIDE)
    w_b = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_f = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    carried = unioned.select(
        *on, *payload, F.col(_TS), F.col(_SIDE),
        F.last("_asof_rs", ignorenulls=True).over(w_b).alias("_asof_mb"),
        F.first("_asof_rs", ignorenulls=True).over(w_f).alias("_asof_mf"),
    ).filter(F.col(_SIDE) == 1)
    ts_type = dict(left.dtypes)[left_ts]
    l_num = _ts_to_num(F.col(_TS), ts_type)
    d_b = l_num - _ts_to_num(F.col("_asof_mb").getField(_MATCH), ts_type)
    d_f = _ts_to_num(F.col("_asof_mf").getField(_MATCH), ts_type) - l_num
    pick_back = F.col("_asof_mf").getField(_MATCH).isNull() | (
        F.col("_asof_mb").getField(_MATCH).isNotNull() & (d_b <= d_f))
    chosen = F.when(pick_back, F.col("_asof_mb")).otherwise(F.col("_asof_mf"))
    tol = _num_tolerance(tolerance_seconds, ts_type)
    in_tol = (F.lit(True) if tol is None else
              F.abs(_ts_to_num(chosen.getField(_MATCH), ts_type) - l_num)
              <= tol)
    out = carried.select(
        *on, *payload,
        *[F.when(in_tol, chosen.getField(c)).alias(c) for c in rvals],
        F.when(in_tol, chosen.getField(_MATCH)).alias(_MATCH),
    )
    return _asof_finish(out, how, matched_ts_col)


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
        .select(key_col, "slot", F.col("_m").getField("v").alias("_v"))
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
