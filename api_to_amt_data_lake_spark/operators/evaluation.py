"""Classifier-evaluation statistics for curation filters.

A training-data pipeline runs binary quality/toxicity/language
classifiers at corpus scale; before trusting one as a filter you ask
two questions — does it RANK well (AUC) and does its score MEAN what
it says (calibration/ECE)? Both are pure count/rank statistics, so
they compute exactly as relational aggregations at any scale — the
classifier-QA companions to the retrieval metrics in
`operators/search.py` (NDCG, P/R@k).

Both are grouped (per language / per source / per shard): a filter
that ranks well globally can be badly mis-calibrated on one slice —
the per-slice view is the one that catches it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_auc(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """ROC-AUC per group via the rank-sum (Mann-Whitney U) identity,
    with the standard average-rank treatment of score ties:

        AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ · n⁻)

    where R⁺ is the sum of the positives' average ranks under
    ascending score order. Output: (groups…, n_pos, n_neg, auc);
    auc = 0.5 where a group has no positives or no negatives
    (undefined — reported as chance, the scikit-learn convention is to
    error; a corpus slice must not kill the whole job, so degenerate
    groups are flagged by their zero count instead).

    Exactness: ranks are derived from per-(group, score) COUNTS — one
    grouped count, one window cumulative sum ordered by score, integer
    arithmetic until the single final division — so the statistic is
    engine- and partitioning-independent with no float folding at all.
    The window partitions by group and orders by the distinct-score
    table (|groups| × |distinct scores| rows), never the raw corpus.
    """
    g = list(group_cols)
    per_score = (
        df.groupBy(*g, F.col(score_col).alias("_s"))
        .agg(F.count(F.lit(1)).alias("_c"),
             F.sum(F.col(label_col).cast("long")).alias("_pos"))
    )
    w = (Window.partitionBy(*g).orderBy(F.col("_s").asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    # Average rank of every row at score s: (#rows below) + (c_s+1)/2.
    # Sum over the positives at s: _pos * that. Doubles only in the
    # per-score product; counts are exact longs.
    ranked = per_score.withColumn(
        "_below", F.coalesce(F.sum("_c").over(w), F.lit(0)))
    stats = ranked.groupBy(*g).agg(
        F.sum("_pos").alias("n_pos"),
        (F.sum("_c") - F.sum("_pos")).alias("n_neg"),
        F.sum(F.col("_pos")
              * (F.col("_below").cast("double")
                 + (F.col("_c").cast("double") + 1.0) / 2.0))
        .alias("_rpos"))
    auc = ((F.col("_rpos")
            - F.col("n_pos").cast("double")
            * (F.col("n_pos").cast("double") + 1.0) / 2.0)
           / (F.col("n_pos").cast("double")
              * F.col("n_neg").cast("double")))
    return stats.select(
        *g, "n_pos", "n_neg",
        F.round(F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                       auc).otherwise(F.lit(0.5)), round_to)
        .alias("auc"))


def grouped_average_precision(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Average precision (area under the precision-recall curve) per
    group — the metric curation teams actually threshold on for
    rare-positive filters (toxicity at a 0.1% base rate: ROC-AUC can
    sit at 0.99 while precision at any usable recall is garbage,
    because AUC credits ranking the 99.9% negatives; AP only credits
    precision where the positives are). VERDICT r10 item 5.

    Step-wise AP with the standard tie handling (one step per DISTINCT
    score, all tied rows move together — the
    `sklearn.metrics.average_precision_score` definition):

        AP = Σ_s (ΔTP_s / n⁺) · (TP_s / N_s)

    over distinct scores s in descending order, where TP_s / N_s are
    the cumulative positives / rows at threshold s (ties included).
    Output: (groups…, n_pos, n_neg, ap); ap = 0.0 with n_pos = 0 when
    a group has no positives (undefined — flagged by the zero count
    rather than killing the job, `grouped_auc`'s convention; an
    all-positive group falls out of the formula as 1.0 naturally).

    Same scale shape as `grouped_auc`: one grouped count to the
    per-(group, score) table, one cumulative window OVER THAT TABLE
    (|groups| × |distinct scores| rows, never the corpus), one final
    group aggregation. Counts stay integer until the per-score
    division."""
    g = list(group_cols)
    per_score = (
        df.groupBy(*g, F.col(score_col).alias("_s"))
        .agg(F.count(F.lit(1)).alias("_c"),
             F.sum(F.col(label_col).cast("long")).alias("_pos"))
    )
    w = (Window.partitionBy(*g).orderBy(F.col("_s").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = per_score.withColumn("_tp", F.sum("_pos").over(w)) \
                   .withColumn("_n", F.sum("_c").over(w))
    stats = cum.groupBy(*g).agg(
        F.sum("_pos").alias("n_pos"),
        (F.sum("_c") - F.sum("_pos")).alias("n_neg"),
        F.sum(F.col("_pos").cast("double")
              * F.col("_tp").cast("double")
              / F.col("_n").cast("double")).alias("_ap_num"))
    return stats.select(
        *g, "n_pos", "n_neg",
        F.round(F.when(F.col("n_pos") > 0,
                       F.col("_ap_num")
                       / F.col("n_pos").cast("double"))
                .otherwise(F.lit(0.0)), round_to).alias("ap"))


def best_f1_threshold(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """The operational end of the AUC/AP story: pick, per group, the
    score threshold that maximizes F1 when "predict positive" means
    score >= threshold — what a curation team actually deploys after
    validating a filter (AP says the ranking is good; this says WHERE
    to cut it, per language/source slice, since the right cut drifts
    across slices exactly like calibration does).

    One step per DISTINCT score over the same per-(group, score) count
    table as `grouped_auc`/`grouped_average_precision`: descending
    cumulative TP and N give F1(s) = 2·TP/(2·TP + FP + FN) at every
    threshold, and the per-group argmax folds into ONE max(struct)
    aggregation (f1 desc, then HIGHEST threshold as the deterministic
    tie-break — the conservative cut that keeps fewer rows). Output:
    (groups…, n_pos, n_neg, threshold, f1); a group with no positives
    has F1 = 0 at every threshold and reports f1 = 0.0 with its zero
    n_pos as the flag (grouped_auc's degenerate-slice convention).
    F1 values are rounded to 9dp before the argmax so the chosen
    threshold is engine-independent."""
    g = list(group_cols)
    per_score = (
        df.groupBy(*g, F.col(score_col).alias("_s"))
        .agg(F.count(F.lit(1)).alias("_c"),
             F.sum(F.col(label_col).cast("long")).alias("_pos"))
    )
    w = (Window.partitionBy(*g).orderBy(F.col("_s").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = per_score.withColumn("_tp", F.sum("_pos").over(w)) \
                   .withColumn("_n", F.sum("_c").over(w))
    # FP = _n − _tp and FN = n_pos − _tp, so the F1 denominator
    # 2·TP + FP + FN telescopes to _n + n_pos — two cumulative longs.
    totals = per_score.groupBy(*g).agg(
        F.sum("_pos").alias("n_pos"),
        (F.sum("_c") - F.sum("_pos")).alias("n_neg"))
    f1 = (2.0 * F.col("_tp").cast("double")
          / (F.col("_n").cast("double")
             + F.col("n_pos").cast("double")))
    scored = (
        cum.join(F.broadcast(totals), g)
        .withColumn("_f1r", F.round(
            F.when(F.col("n_pos") > 0, f1).otherwise(F.lit(0.0)), 9))
    )
    best = scored.groupBy(*g).agg(
        F.max(F.struct(F.col("_f1r"), F.col("_s"))).alias("_b"),
        F.first("n_pos").alias("n_pos"),
        F.first("n_neg").alias("n_neg"))
    return best.select(
        *g, "n_pos", "n_neg",
        F.col("_b._s").alias("threshold"),
        F.round(F.col("_b._f1r"), round_to).alias("f1"))


def calibration_ece(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Expected calibration error per group (Naeini et al. 2015 /
    Guo et al. 2017): scores in [0, 1] are equal-width binned,
    each bin contributes (n_b/N)·|accuracy_b − confidence_b|, and the
    sum is the ECE. Output: (groups…, n, ece); low ECE = the score is
    a usable probability, so "keep docs with p(quality) > 0.8" means
    what it says on that slice.

    Two keyed aggregations (per-(group, bin) then per-group) — counts
    and decimal-folded score sums only, so exact and order-independent;
    per-bin accuracy/confidence are rounded to `round_to` BEFORE the
    final sum so the oracle reproduces the statistic bit-for-bit."""
    g = list(group_cols)
    s = F.col(score_col).cast("double")
    bin_c = F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).cast("int")
    per_bin = (
        df.select(*g, bin_c.alias("_bin"),
                  F.round(s, 9).cast("decimal(38,12)").alias("_s9"),
                  F.col(label_col).cast("long").alias("_y"))
        .groupBy(*g, "_bin")
        .agg(F.count(F.lit(1)).alias("_nb"),
             F.sum("_s9").alias("_conf_sum"),
             F.sum("_y").alias("_acc_sum"))
        .select(
            *g, "_bin", "_nb",
            F.round(F.col("_conf_sum").cast("double") / F.col("_nb"),
                    round_to).alias("_conf"),
            F.round(F.col("_acc_sum").cast("double") / F.col("_nb"),
                    round_to).alias("_acc"))
    )
    return (
        per_bin.groupBy(*g)
        .agg(F.sum("_nb").alias("n"),
             F.round(
                 F.sum(F.col("_nb").cast("double")
                       * F.abs(F.col("_acc") - F.col("_conf")))
                 / F.sum("_nb"), round_to).alias("ece"))
    )


# Cumulative Poisson(1) probabilities e^{-1}·Σ_{j≤k} 1/j!: the inverse-
# CDF ladder for the Poisson bootstrap. Literal doubles, identical in
# the SQL oracle — both engines compare the same exact u against the
# same exact thresholds, so replicate weights agree bit-for-bit.
_POISSON1_CUM = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253,
)


def bootstrap_mean_ci(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    n_boot: int = 64,
    alpha: float = 0.05,
    seed: int = 11,
) -> DataFrame:
    """Per-group mean with a Poisson-bootstrap percentile confidence
    interval — the error bar on "this source's mean quality score" a
    curation dashboard needs before acting on a difference. The
    POISSON bootstrap (Hanley & MacGibbon 2006; the standard
    map-reduce bootstrap) replaces multinomial resampling — which
    needs the group size up front and a global draw — with an
    independent Poisson(1) replicate weight per (row, replicate), so
    it runs as a per-row expression at any scale and any parallelism.

    Determinism (engine-portable, retry-stable): the weight is the
    Poisson(1) inverse CDF of u = (md5(id:b:seed)[:6 hex] + 0.5)/16^6
    — the `weighted_sample_keys` uniform — never rand(). u is exact
    (24-bit integer over a power of two) and the CDF thresholds are
    shared literals, so every engine draws identical weights. For
    INTEGRAL value columns each replicate's weighted sum stays an
    exact integer, making the replicate means — and hence the selected
    percentiles — bit-identical across engines (the conformance
    oracle's hash-parity relies on this; float columns get engine-
    identical weights but sum-order float drift).

    Shape: explode ×n_boot (the deliberate, bounded cost — B× one
    scan, partially aggregated before any shuffle), one groupBy
    (group, replicate) down to B rows per group, then the
    percentile_disc value-frequency shape over those B-row tables.
    Replicates that draw total weight 0 (prob e^{-n}) are dropped, as
    is standard. Output: *group_cols, n, mean (6dp), ci_lo, ci_hi
    (6dp, percentile bootstrap at alpha/2 and 1-alpha/2)."""
    from api_to_amt_data_lake_spark.operators.aggregates import (
        grouped_percentiles_disc,
    )

    b = F.explode(
        F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("_b")
    rep = df.select(
        *[F.col(c) for c in group_cols],
        F.col(value_col).alias("_x"),
        F.col(id_col).cast("string").alias("_id"), b,
    ).where(F.col("_x").isNotNull())
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("_id"),
                              F.col("_b").cast("string"),
                              F.lit(str(seed)))), 1, 6),
        16, 10).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(16 ** 6))
    w = F.lit(len(_POISSON1_CUM))
    for k in range(len(_POISSON1_CUM) - 1, -1, -1):
        w = F.when(u < F.lit(_POISSON1_CUM[k]), F.lit(k)).otherwise(w)
    weighted = rep.withColumn("_w", w.cast("long"))
    means = (
        weighted.groupBy(*group_cols, "_b")
        .agg(F.sum(F.col("_w") * F.col("_x")).alias("_sw"),
             F.sum("_w").alias("_w"))
        .where(F.col("_w") > 0)
        .select(*group_cols,
                (F.col("_sw") / F.col("_w")).alias("_rep_mean"))
    )
    ci = grouped_percentiles_disc(
        means, group_cols, "_rep_mean",
        [alpha / 2, 1 - alpha / 2], ["_lo", "_hi"])
    base = df.where(F.col(value_col).isNotNull()).groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(value_col) / F.count(F.lit(1))).alias("_mean"))
    return (
        base.join(F.broadcast(ci), group_cols)
        .select(*group_cols, "n",
                F.round("_mean", 6).alias("mean"),
                F.round("_lo", 6).alias("ci_lo"),
                F.round("_hi", 6).alias("ci_hi"))
    )


def isotonic_calibration(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Per-group isotonic (PAV) calibration curve over score bins: the
    non-parametric companion to `calibration_ece` — instead of just
    MEASURING miscalibration, fit the monotone non-decreasing mapping
    score → P(label=1) one would apply to fix it (Zadrozny & Elkan
    2002). Scores bin exactly as in calibration_ece (floor(s·n_bins),
    top-clamped), so the fit is over ≤ n_bins points per group.

    Algorithm: the minimax characterization of isotonic regression
    (Robertson, Wright & Dykstra 1988) instead of the sequential PAV
    pooling loop — ŷ_i = max_{j≤i} min_{k≥i} A(j,k), with A(j,k) the
    label rate pooled over bins j..k from prefix sums. That turns an
    inherently sequential algorithm into relational algebra: a prefix
    window over the n_bins rows, a (j ≤ k) pair join (≤ n_bins²/2 rows
    per group), one reverse running-min window partitioned by (group,
    j), and one final partial-aggregated max groupBy. Every A(j,k) is
    an exact-integer ratio and the windows only SELECT values (no
    float folding), so the fit hash-matches the oracle bit-for-bit.

    Scale: the corpus collapses to the (group, bin) count table in one
    partial-aggregated pass; everything after is n_bins²-bounded.
    Output: *group_cols, bin, n, rate (6dp, raw), calibrated (6dp,
    the isotonic fit — non-decreasing in bin within each group)."""
    s = F.col(score_col)
    bin_c = F.least(F.floor(s * n_bins).cast("int"),
                    F.lit(n_bins - 1))
    bins = (
        df.select(*group_cols, bin_c.alias("bin"),
                  F.col(label_col).cast("long").alias("_y"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_y").alias("_s"))
    )
    w_pre = (Window.partitionBy(*group_cols).orderBy("bin")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pre = bins.select(
        *group_cols, "bin", "n", "_s",
        F.sum("n").over(w_pre).alias("_cw"),
        F.sum("_s").over(w_pre).alias("_cs"),
    )
    j = pre.select(*[F.col(c).alias(f"_ga_{c}") for c in group_cols],
                   F.col("bin").alias("_j"),
                   (F.col("_cw") - F.col("n")).alias("_cwj"),
                   (F.col("_cs") - F.col("_s")).alias("_csj"))
    k = pre.select(*group_cols, F.col("bin").alias("_k"),
                   F.col("_cw").alias("_cwk"), F.col("_cs").alias("_csk"))
    cond = [F.col(f"_ga_{c}") == F.col(c) for c in group_cols]
    pairs = j.join(k, cond + [F.col("_j") <= F.col("_k")]).select(
        *group_cols, "_j", "_k",
        ((F.col("_csk") - F.col("_csj"))
         / (F.col("_cwk") - F.col("_cwj"))).alias("_a"),
    )
    w_rmin = (Window.partitionBy(*group_cols, "_j")
              .orderBy(F.col("_k").desc())
              .rowsBetween(Window.unboundedPreceding,
                           Window.currentRow))
    m = pairs.select(*group_cols, F.col("_k").alias("bin"),
                     F.min("_a").over(w_rmin).alias("_m"))
    fit = m.groupBy(*group_cols, "bin").agg(
        F.max("_m").alias("_fit"))
    return (
        bins.join(fit, [*group_cols, "bin"])
        .select(*group_cols, "bin", "n",
                F.round(F.col("_s") / F.col("n"), 6).alias("rate"),
                F.round("_fit", 6).alias("calibrated"))
    )


def bh_fdr(
    df: DataFrame,
    group_cols: list[str],
    pval_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini–Hochberg FDR control per group over a battery of
    p-values — the multiple-testing gate for the keyness/drift
    batteries (q99zze chi², q99zzzd KS, …): testing 100k words at
    α=0.05 hands you 5k false "drifted" words; BH caps the expected
    FALSE-DISCOVERY FRACTION at α instead (Benjamini & Hochberg 1995).

    Computed on the distinct-p-value frequency table (the
    percentile_disc shape — never a window over test rows): for each
    distinct p its highest sorted rank is the cumulative count, the
    BH-adjusted q-value is the reverse running min of p·m/rank over
    descending p (so tied p-values share one exact q), and reject =
    (q ≤ alpha) reproduces max-k thresholding exactly. p·m/rank is
    one multiply + one divide of exact inputs per distinct value —
    identical in any engine, no accumulation.

    Output: *group_cols, pval, n_tests (per-value count), m (group
    test count), q_value (9dp), reject."""
    per_val = (
        df.select(*group_cols, F.col(pval_col).alias("pval"))
        .where(F.col("pval").isNotNull())
        .groupBy(*group_cols, "pval")
        .agg(F.count(F.lit(1)).alias("n_tests"))
    )
    w_cum = (Window.partitionBy(*group_cols).orderBy("pval")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_tot = Window.partitionBy(*group_cols)
    ranked = per_val.select(
        *group_cols, "pval", "n_tests",
        F.sum("n_tests").over(w_cum).alias("_rank"),
        F.sum("n_tests").over(w_tot).alias("m"),
    )
    w_rmin = (Window.partitionBy(*group_cols)
              .orderBy(F.col("pval").desc())
              .rowsBetween(Window.unboundedPreceding,
                           Window.currentRow))
    q_raw = F.col("pval") * F.col("m") / F.col("_rank")
    scored = ranked.withColumn(
        "_q", F.least(F.min(q_raw).over(w_rmin), F.lit(1.0)))
    return scored.select(
        *group_cols, "pval", "n_tests", "m",
        F.round("_q", 9).alias("q_value"),
        (F.col("_q") <= F.lit(alpha)).alias("reject"),
    )


def conformal_threshold(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Split-conformal quantile per group: the calibration-set
    threshold q̂ = the ⌈(n+1)(1−α)⌉-th smallest nonconformity score
    (Vovk et al. 2005; Angelopoulos & Bates 2023). Predicting "accept
    iff score ≤ q̂" on exchangeable future data then guarantees
    coverage ≥ 1−α — distribution-free, the statistically-grounded way
    to turn a curation classifier's raw scores into an accept set with
    a promised error budget. The (n+1) finite-sample correction is the
    whole difference from a plain percentile — without it coverage
    silently undershoots on small calibration slices.

    Shape: the `grouped_percentiles_disc` machinery — value-frequency
    table, cumulative window over DISTINCT scores, one conditional
    min — with the rank threshold ⌈(n+1)(1−α)⌉ instead of ⌈p·n⌉
    (DECIMAL product, exact cross-engine). Groups smaller than
    ⌈1/α⌉ − 1 cannot guarantee coverage (the rank exceeds n): they
    report NULL q_hat rather than a silently-invalid threshold.
    Output: *group_cols, n, cal_rank (the order statistic used),
    q_hat."""
    counts = (
        df.select(*[F.col(g) for g in group_cols],
                  F.col(score_col).alias("_v"))
        .where(F.col("_v").isNotNull())
        .groupBy(*group_cols, "_v")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    w_cum = (Window.partitionBy(*group_cols).orderBy(F.col("_v").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_tot = Window.partitionBy(*group_cols)
    cum = counts.select(
        *[F.col(g) for g in group_cols], F.col("_v"),
        F.sum("_n").over(w_cum).alias("_cum"),
        F.sum("_n").over(w_tot).alias("_tot"))
    rank = F.ceil(
        F.lit(1.0 - alpha).cast("decimal(12,6)") * (F.col("_tot") + 1)
    ).cast("long")
    return (
        cum.groupBy(*group_cols)
        .agg(F.max("_tot").alias("n"),
             F.max(rank).alias("cal_rank"),
             F.min(F.when(F.col("_cum") >= rank, F.col("_v")))
             .alias("q_hat"))
    )
