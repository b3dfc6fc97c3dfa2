"""Aggregation idioms (SURVEY.md §2.4).

The only non-trivial one is the ordered string-agg (A7): the reference
sorts then ``'\\n '.join``s per group
(`equity/student_history_dim/main.py:295-311`). ``collect_list`` order is
nondeterministic under shuffles, so we sort *inside* the array:
collect structs → ``sort_array`` → project the payload → ``concat_ws``.
All JVM-side, one shuffle, deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def string_agg_ordered(
    df: DataFrame,
    keys: Sequence[str],
    value: Column | str,
    order_by: Sequence[Column | str],
    sep: str = "\n ",
    descending: bool = False,
    out_name: str = "agg",
) -> DataFrame:
    """Deterministic per-group ordered string concatenation.

    order_by columns are packed ahead of the value in a struct;
    ``sort_array`` orders lexicographically by struct fields in sequence,
    reproducing the reference's sort-then-join. ``descending=True`` flips
    the whole sort (reference sorts desc at
    `equity/student_history_dim/main.py:101-110`).
    """
    value_c = F.col(value) if isinstance(value, str) else value
    order_cs = [F.col(c) if isinstance(c, str) else c for c in order_by]
    fields = [c.alias(f"_o{i}") for i, c in enumerate(order_cs)]
    fields.append(value_c.alias("_v"))
    arr = F.sort_array(F.collect_list(F.struct(*fields)), asc=not descending)
    joined = F.array_join(F.transform(arr, lambda s: s["_v"]), sep)
    return df.groupBy(*keys).agg(joined.alias(out_name))


def grouped_percentiles_disc(
    df: DataFrame,
    group_col: str | Sequence[str],
    value_col: Column | str,
    percentiles: Sequence[float],
    out_names: Sequence[str] | None = None,
) -> DataFrame:
    """Exact discrete percentiles per group, the SCALABLE way.

    Spark's built-in `percentile` aggregate buffers every value of a
    group in executor memory — a 100 TB group OOMs. This operator
    computes percentile_disc semantics (smallest value v whose
    cumulative count reaches ceil(p·n)) from the value-frequency
    table instead: groupBy (group, value) count (partial-aggregated,
    state bounded by value cardinality), a cumulative-sum window over
    DISTINCT values only, then one conditional-min per requested
    percentile. No per-row buffering anywhere; the window partition
    holds at most |distinct values| rows however big the group is.
    Identical arithmetic in ANSI SQL (conformance q99w).

    `group_col` may be one column name or a sequence of them (the
    per-(language, source) slice shape).

    NULL values are excluded before the frequency table is built —
    percentile_disc ignores NULLs, and engines disagree on NULL sort
    position (Spark windows sort them first, DuckDB last), so keeping
    them would shift every percentile in a null-containing group.
    """
    from pyspark.sql import Window

    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    counts = (
        df.select(*[F.col(g) for g in groups], v.alias("_v"))
        .where(F.col("_v").isNotNull())
        .groupBy(*groups, "_v")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return grouped_percentiles_disc_from_counts(
        counts, groups, "_v", "_n", percentiles, out_names)


def grouped_percentiles_disc_from_counts(
    counts: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    count_col: str,
    percentiles: Sequence[float],
    out_names: Sequence[str] | None = None,
) -> DataFrame:
    """`grouped_percentiles_disc` over an ALREADY-AGGREGATED
    (groups…, value, count) frequency table — the reuse point for
    operators that derive several statistics from one frequency pass
    (`robust_outlier_stats` computes median, MAD and the outlier
    census from a single pinned table instead of re-scanning the
    corpus per statistic). Rows with NULL values must already be
    excluded; the caller owns that because it owns the count pass."""
    from pyspark.sql import Window

    groups = list(group_cols)
    names = list(out_names) if out_names is not None else [
        f"p{str(p).replace('0.', '')}" for p in percentiles]
    w_cum = Window.partitionBy(*groups).orderBy(F.col(value_col).asc())
    w_tot = Window.partitionBy(*groups)
    cum = counts.select(
        *[F.col(g) for g in groups], F.col(value_col),
        F.sum(count_col).over(w_cum).alias("_cum"),
        F.sum(count_col).over(w_tot).alias("_tot"))
    # ceil(p·n) in DECIMAL, not double: SQL engines parse 0.99 as an
    # exact decimal literal while a double 0.99 is 0.98999…, so the
    # float product can straddle the integer boundary and ceil off by
    # one vs the mathematical (and oracle) threshold.
    aggs = [
        F.min(F.when(
            F.col("_cum")
            >= F.ceil(F.lit(p).cast("decimal(12,6)") * F.col("_tot")),
            F.col(value_col))).alias(name)
        for p, name in zip(percentiles, names)
    ]
    return cum.groupBy(*groups).agg(*aggs)


def grouped_percentiles_cont_from_counts(
    counts: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    count_col: str,
    percentiles: Sequence[float],
    out_names: Sequence[str] | None = None,
) -> DataFrame:
    """Exact INTERPOLATED (quantile_cont / Spark `percentile`)
    percentiles per group from a (groups…, value, count) frequency
    table — the scalable replacement for Spark's built-in `percentile`
    aggregate, which buffers every value of a group in executor memory
    (a 100 TB group OOMs; this shape's state is bounded by value
    cardinality, the `grouped_percentiles_disc` contract).

    Arithmetic replicates the built-in bit for bit so callers can swap
    without moving results: zero-based target = p·(n−1) in double;
    with lower = floor(target), the result is
    v[lower]·(lower+1−target) + v[lower+1]·(target−lower) when target
    is fractional, else exactly v[lower] (the same blend order
    Spark's `Percentile.getPercentile` uses — NOT the algebraically
    equal v_lo + frac·Δ, which can differ in the last ulp)."""
    from pyspark.sql import Window

    groups = list(group_cols)
    names = list(out_names) if out_names is not None else [
        f"p{str(p).replace('0.', '')}" for p in percentiles]
    w_cum = Window.partitionBy(*groups).orderBy(F.col(value_col).asc())
    w_tot = Window.partitionBy(*groups)
    cum = counts.select(
        *[F.col(g) for g in groups], F.col(value_col),
        F.sum(count_col).over(w_cum).alias("_cum"),
        F.sum(count_col).over(w_tot).alias("_tot"))
    aggs, posts = [], []
    for p, name in zip(percentiles, names):
        target = F.lit(float(p)) * (F.col("_tot") - F.lit(1)).cast("double")
        lower = F.floor(target)
        # k-th (1-based) order statistic = min value whose cumulative
        # count reaches k; lower/upper are order stats lower+1/lower+2.
        aggs += [
            F.min(F.when(F.col("_cum") >= lower + 1, F.col(value_col)))
            .alias(f"_lo_{name}"),
            F.min(F.when(F.col("_cum") >= lower + 2, F.col(value_col)))
            .alias(f"_hi_{name}"),
            F.max("_tot").alias(f"_tot_{name}"),
        ]
    for p, name in zip(percentiles, names):
        t = (F.lit(float(p))
             * (F.col(f"_tot_{name}") - F.lit(1)).cast("double"))
        lo = F.floor(t)
        vlo, vhi = F.col(f"_lo_{name}"), F.col(f"_hi_{name}")
        posts.append(
            F.when(t == lo.cast("double"), vlo)
            .otherwise(vlo * (lo.cast("double") + F.lit(1.0) - t)
                       + vhi * (t - lo.cast("double"))).alias(name))
    return (cum.groupBy(*groups).agg(*aggs)
            .select(*[F.col(g) for g in groups], *posts))


def cascade_time_rollups(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: Column | str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Continuous-aggregate cascade: hour buckets from raw events, DAY
    buckets re-aggregated from the HOUR partials, WEEK buckets from the
    DAY partials (ISO Monday truncation). Each coarser level reads only
    the level below — at 100 TB the daily rollup scans 24 rows per
    (day, key) instead of the raw event stream, which is the entire
    point of materialized rollup hierarchies (TimescaleDB continuous
    aggregates, Druid/Pinot rollup segments).

    Only MERGEABLE aggregates cascade: counts and sums re-aggregate
    losslessly (as do min/max); COUNT(DISTINCT) does not — a distinct
    cascade needs a mergeable sketch (HLL) carried as the partial
    state instead. Each level returns
    (bucket_start, *key_cols, n_events, value_sum) with value_sum kept
    in DECIMAL until the caller casts, so the re-aggregation is exact.
    decimal(18,2) leaves 16 integer digits of headroom: Spark's
    non-ANSI cast turns an overflowing value into NULL (silently
    dropping it from the sum), so the base cast must be wide enough
    for any single event value, not just the 9,2 the test data needs.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    keys = list(key_cols)
    hour = (
        df.groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("bucket_start"),
            *[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(v.cast("decimal(18,2)")).alias("value_sum"))
    )

    def up(lower: DataFrame, unit: str) -> DataFrame:
        return (
            lower.groupBy(
                F.date_trunc(unit, F.col("bucket_start"))
                .alias("bucket_start"),
                *[F.col(k) for k in keys])
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("value_sum").alias("value_sum"))
        )

    day = up(hour, "day")
    week = up(day, "week")
    return hour, day, week


def robust_outlier_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_mads: float = 5.0,
) -> DataFrame:
    """Median/MAD outlier census per group: (group, median, mad,
    n_outliers) where an outlier is |x − median| > n_mads·MAD — the
    robust alternative to mean/stddev z-scores (one giant value drags
    a mean arbitrarily; the median and the median absolute deviation
    each have a 50% breakdown point, so the fences hold on dirty
    data — the curation use case).

    ONE corpus pass: the scan collapses to the per-(group, value)
    frequency table (partial-aggregated, state bounded by value
    cardinality), which is pinned and feeds every statistic — the
    median (cumulative window over distinct values), the DEVIATION
    frequency table (|v − median| re-keys the same counts, no second
    scan), the MAD (window over the deviation table) and the outlier
    census (a count-weighted sum over the deviation table). The
    round-9 form re-derived each statistic from the corpus (4 scans,
    plus the built-in-percentile shape it replaced would have buffered
    per-group rows); everything after the one scan now runs on tables
    bounded by value cardinality."""
    freq = (
        df.select(F.col(group_col), F.col(value_col).alias("_x"))
        .where(F.col("_x").isNotNull())
        .groupBy(group_col, "_x")
        .agg(F.count(F.lit(1)).alias("_n"))
    ).localCheckpoint()
    med = grouped_percentiles_disc_from_counts(
        freq, [group_col], "_x", "_n", [0.5], ["median"])
    devc = (
        freq.join(F.broadcast(med), group_col)
        .groupBy(group_col, "median",
                 F.abs(F.col("_x") - F.col("median")).alias("_d"))
        .agg(F.sum("_n").alias("_n"))
    )
    mad = grouped_percentiles_disc_from_counts(
        devc, [group_col], "_d", "_n", [0.5], ["mad"])
    return (
        devc.join(F.broadcast(mad), group_col)
        .groupBy(group_col)
        .agg(F.max("median").alias("median"),
             F.max("mad").alias("mad"),
             F.sum(F.when(F.col("_d") > F.lit(n_mads) * F.col("mad"),
                          F.col("_n")).otherwise(F.lit(0)))
             .alias("n_outliers"))
    )


def trimmed_winsorized_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim: float = 0.05,
) -> DataFrame:
    """Exact per-group trimmed AND winsorized means — the robust
    central-tendency pair curation dashboards quote when a handful of
    giant or empty documents would drag a plain mean (complementing
    `robust_outlier_stats`' median/MAD census). The trimmed mean drops
    the ℓ = floor(trim·n) lowest and highest rows; the winsorized mean
    clamps them to the surviving extremes instead (Tukey/Dixon).

    Scalable shape: the corpus collapses to the per-(group, value)
    frequency table (partial-aggregated groupBy); ONE cumulative
    window over DISTINCT values computes each value's kept row count
    as interval overlap — kept = max(0, min(cum, n−ℓ) − max(cum−c, ℓ))
    — so per-row buffering never happens and the window partition is
    bounded by value cardinality (the `grouped_percentiles_disc`
    shape). The clamp values fall out of the same pass as conditional
    min/max over kept>0. Counts, ℓ, and (for integral inputs) the
    kept-mass sums stay exact integers until the two final divisions.

    ``trim`` must be < 0.5 (then n − 2ℓ ≥ 1, so the mean is always
    defined); ℓ uses a DECIMAL product like `grouped_percentiles_disc`
    so floor can't straddle an integer boundary vs the oracle. NULL
    values are excluded. Output: group, n, n_trim (ℓ),
    trimmed_mean (6dp), winsorized_mean (6dp)."""
    if not 0.0 <= trim < 0.5:
        raise ValueError(f"trim must be in [0, 0.5), got {trim}")
    from pyspark.sql import Window

    counts = (
        df.select(F.col(group_col), F.col(value_col).alias("_v"))
        .where(F.col("_v").isNotNull())
        .groupBy(group_col, "_v")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w_cum = Window.partitionBy(group_col).orderBy(F.col("_v").asc())
    w_tot = Window.partitionBy(group_col)
    cum = counts.select(
        F.col(group_col), F.col("_v"), F.col("_c"),
        F.sum("_c").over(w_cum).alias("_cum"),
        F.sum("_c").over(w_tot).alias("_n"))
    ell = F.floor(F.lit(trim).cast("decimal(12,6)")
                  * F.col("_n")).cast("long")
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("_cum"), F.col("_n") - ell)
        - F.greatest(F.col("_cum") - F.col("_c"), ell))
    scored = cum.select(
        F.col(group_col), F.col("_v"), F.col("_n"),
        ell.alias("_l"), kept.alias("_k"))
    agg = scored.groupBy(group_col).agg(
        F.max("_n").alias("n"),
        F.max("_l").alias("n_trim"),
        F.sum(F.col("_v") * F.col("_k")).alias("_s"),
        F.min(F.when(F.col("_k") > 0, F.col("_v"))).alias("_vlo"),
        F.max(F.when(F.col("_k") > 0, F.col("_v"))).alias("_vhi"),
    )
    return agg.select(
        group_col, "n", "n_trim",
        F.round(F.col("_s") / (F.col("n") - 2 * F.col("n_trim")), 6)
        .alias("trimmed_mean"),
        F.round((F.col("_s")
                 + F.col("n_trim") * (F.col("_vlo") + F.col("_vhi")))
                / F.col("n"), 6).alias("winsorized_mean"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Cohen's kappa between two categorical label columns, optionally
    per group — chance-corrected agreement (Cohen 1960):
    κ = (p_o − p_e) / (1 − p_e) with p_o the observed agreement rate
    and p_e = Σ_k p_a(k)·p_b(k) the agreement two independent raters
    with these marginals would reach by chance. THE label-quality
    primitive for training-data pipelines: κ between two annotators
    (or two heuristic quality filters) says whether they agree beyond
    what their base rates force — raw agreement rates do not.

    Output: (groups…, n, po, pe, kappa); κ = 0 where p_e = 1 (a
    degenerate constant-label group — no agreement is distinguishable
    from chance). All counts, so the statistic is exact.

    Scale shape: one grouped count for p_o, two (group, label)
    marginal counts joined on the shared label space for p_e — the
    marginal tables are |groups|×|labels| rows (broadcast-sized for
    real label spaces), and nothing but counts crosses the wire."""
    g = list(group_cols or [])
    a, b = F.col(rater_a), F.col(rater_b)
    base = df.select(*g, a.alias("_a"), b.alias("_b"))
    tot = base.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("_a") == F.col("_b"), 1).otherwise(0))
        .alias("_agree"))
    ca = base.groupBy(*g, F.col("_a").alias("_k")) \
        .agg(F.count(F.lit(1)).alias("_ca"))
    cb = base.groupBy(*g, F.col("_b").alias("_k")) \
        .agg(F.count(F.lit(1)).alias("_cb"))
    pe = (ca.join(cb, [*g, "_k"])
          .groupBy(*g)
          .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_pe_num")))
    po_c = F.col("_agree").cast("double") / F.col("n")
    # Left join + 0-fill: a group whose raters share NO label has
    # p_e = 0 (κ = p_o), it must not vanish from the result.
    pe_c = (F.coalesce(F.col("_pe_num"), F.lit(0)).cast("double")
            / (F.col("n") * F.col("n")))
    return (
        tot.join(pe, g, "left") if g else tot.crossJoin(pe)
    ).select(
        *g, "n",
        F.round(po_c, round_to).alias("po"),
        F.round(pe_c, round_to).alias("pe"),
        F.round(F.when(pe_c < 1.0, (po_c - pe_c) / (1.0 - pe_c))
                .otherwise(F.lit(0.0)), round_to).alias("kappa"),
    )
