"""Corpus-level distribution analytics for training-data curation.

Five batch operators a large-scale pretraining pipeline runs between
crawl generations, complementing the per-document signals in
``operators/text.py`` and the vocabulary-drift KL of the conformance
suite (q99zzf):

- :func:`psi_drift` — Population Stability Index over fixed-width bins
  of a numeric document property (the banking-industry drift score,
  here applied to e.g. document length between snapshots).
- :func:`bigram_pmi` — pointwise mutual information of adjacent token
  pairs (collocation / phrase mining, Church & Hanks 1990).
- :func:`lorenz_concentration` — Lorenz curve + Gini coefficient + HHI
  of document counts across a categorical key (is one source/domain
  dominating the mix?).
- :func:`ngram_type_growth` — Heaps'-law type-accumulation curve: how
  many NEW bigram types each successive slice of the corpus
  contributes (a flattening curve says more of the same crawl adds no
  new vocabulary).
- :func:`zipf_fit` — log-log OLS fit of the token rank/frequency
  curve (Zipf's law); a slope far from -1 flags synthetic or
  boilerplate-heavy text.
- :func:`word_dispersion` — Gries' deviation of proportions (DP):
  which words concentrate in few corpus parts (boilerplate / site
  chrome) vs spread evenly (function words).
- :func:`ks_drift` — grouped two-sample Kolmogorov–Smirnov statistic:
  the exact distribution-shift test PSI's fixed bins approximate, with
  the location of the supremum.
- :func:`js_divergence` — grouped Jensen–Shannon divergence between a
  reference and a current item distribution: the symmetric, bounded
  drift scalar (one number per group, vs q99zzf's per-word KL terms).
- :func:`vocab_richness` — Chao1 estimated vocabulary size and
  Good–Turing coverage per group: how much unseen vocabulary a source
  still holds (a saturated source adds nothing to the next epoch).

All are pure DataFrame compositions (zero Python UDFs) whose
shuffles carry only aggregated state:

- ``psi_drift`` / ``ngram_type_growth`` reduce the corpus to a
  ``bins``-row table before any window runs.
- ``bigram_pmi``'s unigram⋈bigram joins key on the word; the
  ``min_count`` filter runs BEFORE the joins so the shuffled side is
  the (already tiny) surviving-collocation table, and Catalyst/AQE
  broadcasts the unigram side when its stats allow.
- ``lorenz_concentration`` / ``zipf_fit`` rank a key-cardinality table
  (sources / vocabulary), orders of magnitude smaller than the corpus;
  the single-partition window is bounded by that cardinality, never by
  corpus rows (the two-phase bucketed-rank scheme of
  ``sampling.deterministic_shuffle`` is the fallback if a vocabulary
  ever rivals corpus size).

Determinism (DuckDB oracle hash-parity): counts, ranks and cumulative
sums stay integer until one final double expression per output column,
mirrored token-for-token in the oracle SQL; float aggregations
(``regr_*``) follow the q99zzc precedent of rounding at 4-6dp.

Beyond reference parity: the reference pipeline (API-to-AMT) has no
corpus-statistics surface; these serve SURVEY.md's training-data-
pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators.smallframe import (
    exclusive_prefix_sums,
    ordered_rank_and_lag,
)


def psi_drift(df: DataFrame, value_col: str, is_cur_col: str,
              bins: int = 10) -> DataFrame:
    """Population Stability Index terms between a reference and a
    current slice of ``df`` over fixed-width integer bins of
    ``value_col``.

    Bin width derives from the REFERENCE slice's max (``max//bins + 1``,
    integer math — exact in any engine); current-slice values beyond the
    reference range clamp into the top bin, which is exactly where PSI
    should see them. Missing bins are materialized from a ``range(bins)``
    spine so add-0.5 smoothing always covers ``bins`` cells and the
    output row count is fixed. PSI = Σ psi_term; terms are returned
    per-bin (the actionable view: WHICH stratum moved).

    Scale shape: one groupBy on a ``bins``-valued key (map-side partial
    aggregation collapses each task to ≤ ``bins`` rows), one broadcast
    scalar for the width, one broadcast totals row. No corpus-sized
    shuffle exists in the plan.
    """
    is_cur = F.col(is_cur_col)
    ref_max = df.filter(~is_cur).agg(
        F.max(value_col).cast("long").alias("_vmax"))
    binned = (
        df.crossJoin(F.broadcast(ref_max))
        .select(
            F.least(
                F.lit(bins - 1),
                F.expr(f"CAST({value_col} AS BIGINT) DIV "
                       f"(_vmax DIV {bins} + 1)"),
            ).alias("bin"),
            is_cur.cast("int").alias("_cur"),
        )
    )
    counts = binned.groupBy("bin").agg(
        F.sum("_cur").alias("n_cur"),
        F.sum(1 - F.col("_cur")).alias("n_ref"),
    )
    spine = df.sparkSession.range(bins).select(F.col("id").alias("bin"))
    full = (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    totals = full.agg(F.sum("n_ref").alias("_t_ref"),
                      F.sum("n_cur").alias("_t_cur"))
    p_ref = (F.col("n_ref") + 0.5) / (F.col("_t_ref") + 0.5 * bins)
    p_cur = (F.col("n_cur") + 0.5) / (F.col("_t_cur") + 0.5 * bins)
    return (
        full.crossJoin(F.broadcast(totals))
        .select(
            "bin", "n_ref", "n_cur",
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6)
            .alias("psi_term"),
        )
    )


def _bigrams(df: DataFrame, text_col: str, extra_cols: list[str]
             ) -> DataFrame:
    """Adjacent-token pairs per document: split on single spaces (the
    testdata/oracle tokenizer shared with q99zzf), zip the array with
    its own 1-shifted tail, explode. A one-token document yields zero
    rows (empty slice), matching the oracle's empty list-zip."""
    toks = df.select(
        *extra_cols, F.split(F.trim(F.col(text_col)), " ").alias("_t"))
    sliced = toks.select(
        *extra_cols,
        F.expr("slice(_t, 1, size(_t) - 1)").alias("h"),
        F.expr("slice(_t, 2, size(_t) - 1)").alias("r"),
    )
    return sliced.select(
        *extra_cols, F.explode(F.arrays_zip("h", "r")).alias("_bg")
    ).select(
        *extra_cols,
        F.col("_bg.h").alias("w1"),
        F.col("_bg.r").alias("w2"),
    )


def bigram_pmi(df: DataFrame, text_col: str,
               min_count: int = 5) -> DataFrame:
    """Collocation mining: PMI of adjacent token pairs,
    ``ln(p(xy) / (p(x)·p(y)))`` with bigram probability over total
    bigrams and unigram probabilities over total tokens (Church & Hanks
    1990). Pairs below ``min_count`` are dropped BEFORE the unigram
    joins, so the join input is the surviving-collocation table, not
    the corpus.

    Scale shape: two grouped counts (unigrams, bigrams — both partial-
    aggregated map-side), two scalar broadcasts for the totals, and two
    equi-joins keyed on the word whose left side is post-filter tiny;
    AQE broadcasts the unigram side when its stats allow. Output is one
    row per surviving pair: ``w1, w2, n_xy, pmi`` (6dp)."""
    uni = (
        df.select(F.explode(F.split(F.trim(F.col(text_col)), " "))
                  .alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    )
    n_tok = uni.agg(F.sum("c_w").alias("_n_tok"))
    bi = (
        _bigrams(df, text_col, [])
        .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_xy"))
    )
    n_bi = bi.agg(F.sum("n_xy").alias("_n_bi"))
    surv = bi.filter(F.col("n_xy") >= min_count)
    u1 = uni.select(F.col("w").alias("w1"), F.col("c_w").alias("_c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c_w").alias("_c2"))
    joined = (
        surv.join(u1, "w1").join(u2, "w2")
        .crossJoin(F.broadcast(n_bi))
        .crossJoin(F.broadcast(n_tok))
    )
    p_xy = F.col("n_xy") / F.col("_n_bi")
    p_x = F.col("_c1") / F.col("_n_tok")
    p_y = F.col("_c2") / F.col("_n_tok")
    return joined.select(
        "w1", "w2", "n_xy",
        F.round(F.log(p_xy / (p_x * p_y)), 6).alias("pmi"),
    )


def lorenz_concentration(df: DataFrame, key_col: str) -> DataFrame:
    """Lorenz curve of row counts across ``key_col`` plus the two
    standard concentration scalars replicated on every row: the Gini
    coefficient (``2·Σ rank·cᵢ / (n·T) − (n+1)/n`` over counts ranked
    ascending — the integer-sum form, so the only float op per output
    value is one final division) and the Herfindahl–Hirschman index
    (``Σcᵢ²/T²``, again integer sums first).

    Scale shape: the corpus collapses to one row per key before any
    ordered pass, and the global rank/prefix-sum run through the
    packed-array `smallframe` helpers (zero WindowExec — the repo-wide
    plan-audit rule), bounded by key cardinality (sources/domains —
    thousands, not corpus rows). Callers must pass a key whose
    cardinality is bounded by construction."""
    c = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_rows"))
    ranked = ordered_rank_and_lag(
        c, ["n_rows", key_col], [key_col, "n_rows"])
    prefix = exclusive_prefix_sums(ranked, "rank", {"n_rows": "_excl"})
    ranked = (
        ranked.join(F.broadcast(prefix), "rank")
        .withColumn("_cum", F.col("_excl") + F.col("n_rows"))
    )
    tot = ranked.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("n_rows").alias("_t"),
        F.sum(F.col("rank") * F.col("n_rows")).alias("_s"),
        F.sum(F.col("n_rows") * F.col("n_rows")).alias("_q"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            key_col, "n_rows", "rank",
            F.round(F.col("n_rows") / F.col("_t"), 6).alias("share"),
            F.round(F.col("_cum") / F.col("_t"), 6).alias("cum_share"),
            F.round(
                (2.0 * F.col("_s")) / (F.col("_n") * F.col("_t"))
                - (F.col("_n") + 1.0) / F.col("_n"), 6).alias("gini"),
            F.round(F.col("_q") / (F.col("_t") * F.col("_t")), 6)
            .alias("hhi"),
        )
    )


def ngram_type_growth(df: DataFrame, id_col: str, text_col: str,
                      buckets: int = 10) -> DataFrame:
    """Heaps'-law type-accumulation curve over bigram types: assign
    each DISTINCT bigram to the corpus decile (by ``id_col`` order)
    where it first appears, and report new + cumulative type counts per
    decile. A flattening ``cum_types`` curve quantifies how little new
    phrasal vocabulary additional crawl volume buys.

    Every value is an integer (min-id first-appearance, integer-div
    bucket, counts, running sum over a ``buckets``-row table), so
    cross-engine hashes match with no float rule at all.

    Scale shape: explode → groupBy(bigram).min(id) is the only
    corpus-sized shuffle (partial-aggregated map-side); everything
    after runs on ≤ vocabulary rows, then ≤ ``buckets`` rows."""
    n_docs = df.agg(F.count(F.lit(1)).alias("_n_docs"))
    first = (
        _bigrams(df, text_col, [id_col])
        .groupBy("w1", "w2").agg(F.min(id_col).alias("_first"))
    )
    bucketed = (
        first.crossJoin(F.broadcast(n_docs))
        .select(
            F.least(
                F.lit(buckets - 1),
                F.expr(f"(_first * {buckets}) DIV _n_docs"),
            ).alias("bucket")
        )
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("new_types"))
    )
    spine = df.sparkSession.range(buckets).select(
        F.col("id").alias("bucket"))
    full = (
        spine.join(bucketed, "bucket", "left")
        .select("bucket",
                F.coalesce("new_types", F.lit(0)).alias("new_types"))
    )
    # Running total over the ``buckets``-row spine via the packed-array
    # prefix fold (zero WindowExec — the repo-wide plan-audit rule).
    prefix = exclusive_prefix_sums(full, "bucket", {"new_types": "_excl"})
    return (
        full.join(F.broadcast(prefix), "bucket")
        .select("bucket", "new_types",
                (F.col("_excl") + F.col("new_types")).alias("cum_types"))
    )


def word_dispersion(df: DataFrame, key_col: str, text_col: str,
                    min_count: int = 5) -> DataFrame:
    """Gries' deviation of proportions (DP, Gries 2008): how unevenly a
    word distributes across corpus parts (sources/domains) relative to
    the parts' sizes — DP near 0 = evenly spread (function words), near
    1 = bursty/concentrated (boilerplate, site chrome, one domain's
    jargon). The curation signal behind per-domain boilerplate lists.

    DP_w = 0.5 · Σᵢ |vᵢ − sᵢ| with vᵢ = word share in part i and sᵢ =
    part i's token share. Computed in INTEGER cross-multiplied form —
    0.5 · (Σᵢ∈present |c_wi·T − C_w·Tᵢ| + C_w·(T − Σᵢ∈present Tᵢ)) /
    (C_w·T) — so absent parts need no word×part spine (their term
    telescopes to C_w·(T − ΣTᵢ)) and every accumulation is an exact
    integer; the only float op per row is the final division. The
    64-bit products bound the exact range to C_w·T < 2⁶³ (≈9.2e18 —
    token counts beyond that need the decimal variant).

    Scale shape: one explode → groupBy(word, part) count (partial-
    aggregated), part totals collapse to |parts| rows (broadcast), word
    totals to |vocab| rows; the ``min_count`` filter bounds the output
    before the joins. Output: word, c_w, dp (6dp)."""
    toks = df.select(
        F.col(key_col).alias("_part"),
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("w"),
    )
    c = toks.groupBy("w", "_part").agg(F.count(F.lit(1)).alias("c_wi"))
    t_i = c.groupBy("_part").agg(F.sum("c_wi").alias("t_i"))
    c_w = (c.groupBy("w").agg(F.sum("c_wi").alias("c_w"))
           .filter(F.col("c_w") >= min_count))
    t = t_i.agg(F.sum("t_i").alias("_t"))
    j = (
        c.join(c_w, "w")
        .join(F.broadcast(t_i), "_part")
        .crossJoin(F.broadcast(t))
        .select(
            "w", "c_w", "_t",
            F.abs(F.col("c_wi") * F.col("_t")
                  - F.col("c_w") * F.col("t_i")).alias("_term"),
            F.col("t_i").alias("_t_present"),
        )
    )
    agg = j.groupBy("w", "c_w", "_t").agg(
        F.sum("_term").alias("_s_present"),
        F.sum("_t_present").alias("_st"),
    )
    dp = (
        0.5 * (F.col("_s_present")
               + F.col("c_w") * (F.col("_t") - F.col("_st")))
        / (F.col("c_w") * F.col("_t"))
    )
    return agg.select("w", "c_w", F.round(dp, 6).alias("dp"))


def ks_drift(df: DataFrame, group_cols: list[str], value_col: str,
             is_cur_col: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per group between a
    reference and a current slice: D = supₓ |F_cur(x) − F_ref(x)| over
    the observed values — the distribution-shift test PSI's fixed bins
    approximate, exact here because the empirical CDFs only step at
    observed values. Reported with the location of the supremum
    (``ks_x``, smallest such value on ties) — WHERE the distributions
    diverge most.

    Computed in integer cross-multiplied form: per distinct (group,
    value) the cumulative counts fold over a value-ordered window
    (partitioned by group, running over DISTINCT values — the q99zzq
    grouped-AUC shape, never corpus rows), and D's numerator
    |cum_cur·n_ref − cum_ref·n_cur| stays integer until one final
    division by n_cur·n_ref. The per-group argmax is one
    min(struct(-num, value)) partial aggregation, no second window.
    Groups with an empty slice are excluded (D is undefined there).
    Output: *group_cols, n_ref, n_cur, ks_x, ks_d (6dp)."""
    from pyspark.sql import Window

    is_cur = F.col(is_cur_col)
    per_val = df.groupBy(*group_cols, value_col).agg(
        F.sum(is_cur.cast("long")).alias("_c_cur"),
        F.sum((~is_cur).cast("long")).alias("_c_ref"),
    )
    w = (Window.partitionBy(*group_cols).orderBy(value_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = per_val.select(
        *group_cols, value_col,
        F.sum("_c_cur").over(w).alias("_cum_cur"),
        F.sum("_c_ref").over(w).alias("_cum_ref"),
    )
    tot = per_val.groupBy(*group_cols).agg(
        F.sum("_c_cur").alias("n_cur"),
        F.sum("_c_ref").alias("n_ref"),
    ).filter((F.col("n_cur") > 0) & (F.col("n_ref") > 0))
    num = F.abs(F.col("_cum_cur") * F.col("n_ref")
                - F.col("_cum_ref") * F.col("n_cur"))
    best = (
        cum.join(F.broadcast(tot), group_cols)
        .groupBy(*group_cols, "n_ref", "n_cur")
        .agg(F.min(F.struct((-num).alias("_neg"),
                            F.col(value_col).alias("_x"))).alias("_b"))
    )
    return best.select(
        *group_cols, "n_ref", "n_cur",
        F.col("_b._x").alias("ks_x"),
        F.round((-F.col("_b._neg"))
                / (F.col("n_cur") * F.col("n_ref")), 6).alias("ks_d"),
    )


def js_divergence(df: DataFrame, group_cols: list[str], item_col: str,
                  is_cur_col: str) -> DataFrame:
    """Grouped Jensen–Shannon divergence between the reference and
    current item distributions: JSD = 0.5·KL(P‖M) + 0.5·KL(Q‖M) with
    M = (P+Q)/2 — the symmetric, always-finite drift scalar (bounded
    by ln 2) that turns "did this source's vocabulary move?" into ONE
    number per group, where q99zzf's KL emits per-word terms and needs
    smoothing to stay finite. No smoothing here: items absent from one
    side contribute the exact 0·ln0 = 0 / q·ln2 limits, so the score
    is a true metric-squared (Endres & Schindelin 2003).

    Shape: per-(group, item) two-sided counts (one partial-aggregated
    groupBy over the scan), per-group totals broadcast back, one
    codegen term per distinct item, one final grouped sum — state
    bounded by item cardinality, never corpus rows. Groups missing
    either slice are excluded (JSD needs both distributions).
    Output: *group_cols, n_ref, n_cur, jsd (6dp, nats)."""
    is_cur = F.col(is_cur_col)
    per_item = df.groupBy(*group_cols, item_col).agg(
        F.sum(is_cur.cast("long")).alias("_c_cur"),
        F.sum((~is_cur).cast("long")).alias("_c_ref"),
    )
    tot = per_item.groupBy(*group_cols).agg(
        F.sum("_c_cur").alias("n_cur"),
        F.sum("_c_ref").alias("n_ref"),
    ).filter((F.col("n_cur") > 0) & (F.col("n_ref") > 0))
    p = F.col("_c_cur") / F.col("n_cur")
    q = F.col("_c_ref") / F.col("n_ref")
    m = (p + q) / 2
    term = (
        0.5 * F.when(F.col("_c_cur") > 0, p * F.log(p / m)).otherwise(0.0)
        + 0.5 * F.when(F.col("_c_ref") > 0, q * F.log(q / m)).otherwise(0.0)
    )
    return (
        per_item.join(F.broadcast(tot), group_cols)
        .groupBy(*group_cols, "n_ref", "n_cur")
        .agg(F.round(F.sum(term), 6).alias("jsd"))
    )


def vocab_richness(df: DataFrame, group_cols: list[str], text_col: str
                   ) -> DataFrame:
    """Chao1 vocabulary-richness estimate and Good–Turing coverage per
    group: from the type-frequency spectrum (f1 = types seen once,
    f2 = seen twice), Chao1 (bias-corrected, Chao 1984) estimates the
    TOTAL vocabulary a source holds — seen plus unseen —

        chao1 = V + f1·(f1 − 1) / (2·(f2 + 1))

    and Good–Turing sample coverage C = 1 − f1/N says what fraction of
    the source's token mass the observed vocabulary already covers. A
    source whose coverage ≈ 1 and chao1 ≈ V is mined out — more crawl
    of it adds tokens, not types; a low-coverage source is where the
    next epoch's new vocabulary lives.

    Shape: explode → per-(group, word) count (partial-aggregated) →
    ONE grouped agg over the type table (f1/f2/V/N as conditional
    sums). Integer until the two final divisions.
    Output: *group_cols, n_tokens, v_types, f1, f2, chao1 (2dp),
    coverage (6dp)."""
    toks = df.select(
        *[F.col(c) for c in group_cols],
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("_w"),
    )
    types = toks.groupBy(*group_cols, "_w").agg(
        F.count(F.lit(1)).alias("_c"))
    f1 = F.sum((F.col("_c") == 1).cast("long"))
    f2 = F.sum((F.col("_c") == 2).cast("long"))
    agg = types.groupBy(*group_cols).agg(
        F.sum("_c").alias("n_tokens"),
        F.count(F.lit(1)).alias("v_types"),
        f1.alias("f1"),
        f2.alias("f2"),
    )
    chao1 = (F.col("v_types")
             + (F.col("f1") * (F.col("f1") - 1))
             / (2.0 * (F.col("f2") + 1)))
    return agg.select(
        *group_cols, "n_tokens", "v_types", "f1", "f2",
        F.round(chao1, 2).alias("chao1"),
        F.round(1.0 - F.col("f1") / F.col("n_tokens"), 6)
        .alias("coverage"),
    )


def zipf_fit(df: DataFrame, text_col: str, top_n: int = 1000
             ) -> DataFrame:
    """Zipf's-law fit: OLS of ``ln(frequency)`` on ``ln(rank)`` over
    the ``top_n`` most frequent tokens (rank ties broken by token, so
    the regression input set is deterministic). Natural text sits near
    slope −1; template/boilerplate corpora flatten, synthetic token
    soups steepen. Returns one row: ``n_types, slope, intercept, r2``
    (rounded 4/4/5dp — the q99zzc REGR_* precedent).

    Scale shape: corpus → vocabulary via one partial-aggregated count;
    the top-``top_n`` cut is an orderBy+limit (TakeOrderedAndProject:
    per-partition top-k, driver merges k·partitions rows — no global
    sort at any vocabulary size), ranks are assigned on the now-bounded
    ``top_n`` rows via the packed-array `smallframe` helper (zero
    WindowExec), and ``regr_*`` partial-aggregates to a single
    co-moment state."""
    uni = (
        df.select(F.explode(F.split(F.trim(F.col(text_col)), " "))
                  .alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    )
    top = uni.orderBy(F.desc("c_w"), F.asc("w")).limit(top_n)
    ranked = ordered_rank_and_lag(top, [-F.col("c_w"), "w"], ["c_w"])
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("c_w").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 5).alias("r2"),
    )
