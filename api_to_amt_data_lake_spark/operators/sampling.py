"""Deterministic sampling for training-data pipelines.

`df.sample()` draws from a per-partition RNG, so results change with
partitioning and retries — useless for reproducible dataset curation or
for cross-engine conformance checks. These operators derive the keep/drop
decision from the row's own ID via a multiplicative hash (Knuth's 2^32
golden-ratio constant), so the same row is kept in every run, on every
engine, at any partitioning, and membership is a pure sargable filter —
no shuffle, fully pushed into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH_32 = 2654435761  # 2^32 / golden ratio, Knuth TAOCP vol 3 §6.4
_M32 = 1 << 32


def hash_bucket(id_col: Column | str, modulus: int = _M32) -> Column:
    """Deterministic bucket in [0, modulus) from an integer ID column."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (c * F.lit(KNUTH_32)) % F.lit(modulus)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows.

    `fractions` maps stratum values to keep-rates (e.g. language mixing
    weights: {'en': 0.5, 'de': 0.1}); strata not listed keep
    `default_fraction`. The filter compares the row's hash bucket to the
    stratum's integer threshold — exactly reproducible in ANSI SQL
    (conformance q44), and at 100 TB it is a scan-level filter: no
    shuffle, no state, trivially parallel.
    """
    thresh: Column = F.lit(int(default_fraction * _M32))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(stratum_col) == value, F.lit(int(frac * _M32))
        ).otherwise(thresh)
    return df.filter(hash_bucket(id_col) < thresh)


def temperature_weights(
    df: DataFrame,
    group_col: str,
    size_col: Column | str,
    token_budget: int,
) -> DataFrame:
    """Temperature-based mixture reweighting (the multilingual/source
    sampling scheme of XLM / mT5: draw from source s with probability
    proportional to size_s^alpha, alpha < 1, so small sources are
    up-sampled and head sources down-sampled). alpha is fixed at 0.5
    (sqrt), which is IEEE-correctly-rounded in every engine — the one
    temperature that is bit-reproducible cross-engine.

    Output per group: n_rows, total_size, weight (normalized sqrt
    share), sampled_size (weight x token_budget), oversample_factor
    (sampled_size / total_size — >1 means the source repeats).

    Scale shape: one partial-aggregated groupBy over the corpus, then a
    broadcast of the one-row normalizer onto the (tiny) per-group table.
    Nothing about the corpus itself is shuffled beyond the first agg.
    """
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    per_group = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(size).alias("total_size"),
    )
    z = per_group.agg(
        F.sum(F.sqrt(F.col("total_size").cast("double"))).alias("_z"))
    return (
        per_group.crossJoin(F.broadcast(z))
        .withColumn(
            "weight",
            F.round(F.sqrt(F.col("total_size").cast("double")) / F.col("_z"), 6),
        )
        .withColumn(
            "sampled_size",
            F.round(F.col("weight") * F.lit(float(token_budget)), 2),
        )
        .withColumn(
            "oversample_factor",
            F.round(F.col("sampled_size") / F.col("total_size").cast("double"), 6),
        )
        .drop("_z")
    )


def weighted_sample_keys(
    df: DataFrame, id_col: str, weight_col: str, seed: int = 7,
) -> DataFrame:
    """Adds `_wkey`: the Efraimidis–Spirakis A-ES sampling key
    ln(u)/w, where u is a deterministic uniform in (0,1) derived from
    md5(id:seed) (first 6 hex digits -> (h+0.5)/16^6). The k rows with
    the LARGEST key are a weighted sample without replacement with
    inclusion probability proportional to `weight_col` (Efraimidis &
    Spirakis 2006: u^(1/w) order == ln(u)/w order for w>0).

    Deterministic by construction — never `rand()`: reruns, retries and
    different partitionings all draw the same sample, and the key is
    reproducible in any engine with md5 + ln. Keys are rounded to 9dp;
    callers MUST tie-break on id when selecting top-k.

    Scale: per-row expression, zero shuffle; a top-k on `_wkey` is a
    TakeOrdered (per-partition heap + small merge), never a full sort.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                              F.lit(str(seed)))), 1, 6),
        16, 10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(16 ** 6))
    return df.withColumn(
        "_wkey", F.round(F.log(u) / F.col(weight_col), 9)
    )


def deterministic_shuffle(
    df: DataFrame, id_col: str, seed: int = 42,
    strata_col: str | None = None,
) -> DataFrame:
    """Reproducible global shuffle order for training-data serving: adds
    `shuffle_pos` (0-based, dense, gap-free) = the row's position under
    ORDER BY md5(id || ':' || seed). Same seed -> same permutation on
    every engine, at any parallelism, across retries; a new seed is a
    fresh epoch-level reshuffle.

    With `strata_col` the order becomes (strata ASC, md5 key) — the
    CURRICULUM shape: stages served in order (easy→hard difficulty
    buckets, clean→noisy sources), rows within a stage in seeded random
    order, positions still globally dense. Strata cardinality must be
    small (it multiplies the bucket table: |strata| × 256 rows).

    The global rank is computed with the two-phase scheme (same idea as
    `operators/packing.py::pack_offsets`), NOT a partition-less window:
    (strata,) + the first two hex chars of the key split the order into
    buckets whose struct sort order equals the row order, so
    within-bucket ranks run fully parallel and only the bucket count
    table takes a single packed-array prefix fold before being
    broadcast back. No stage ever holds more than ~1/256 of the data —
    this is the shape that survives 100 TB, where `row_number() OVER
    (ORDER BY hash)` would collapse onto one task.
    """
    key = F.md5(F.concat_ws(
        ":", F.col(id_col).cast("string"), F.lit(str(seed))))
    # bucket struct: leading strata (if any) then the 2-hex-char prefix;
    # array_sort's struct order == the intended global row order.
    if strata_col is not None:
        bucket = F.struct(F.col(strata_col).alias("s"),
                          F.substring("_key", 1, 2).alias("hb"))
    else:
        bucket = F.struct(F.substring("_key", 1, 2).alias("hb"))
    keyed = df.withColumn("_key", key).withColumn("_b", bucket)
    from pyspark.sql import Window

    w_in = Window.partitionBy("_b").orderBy(F.col("_key").asc())
    local = keyed.withColumn("_local", F.row_number().over(w_in) - 1)
    counts = keyed.groupBy("_b").agg(F.count(F.lit(1)).alias("_cnt"))
    from api_to_amt_data_lake_spark.operators.smallframe import (
        exclusive_prefix_sums,
    )
    bases = exclusive_prefix_sums(counts, "_b", {"_cnt": "_base"})
    return (
        local.join(F.broadcast(bases), "_b")
        .withColumn("shuffle_pos", (F.col("_base") + F.col("_local")).cast("long"))
        .drop("_key", "_b", "_local", "_base")
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    hex_chars: int = 2,
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): score every raw document by how target-like its
    hashed-unigram bag is. Each token hashes into one of 16^hex_chars
    buckets (md5 hex prefix — same portable hash as the CMS/minhash
    ops); bucket distributions are estimated for the target corpus and
    the raw corpus with add-one smoothing, and a document's importance
    log-weight is the sum over its tokens of
    ln p_target(bucket) - ln p_raw(bucket). Sampling raw docs with
    probability proportional to exp(logw) yields a target-shaped
    training mix — the standard pretraining-data curation move when the
    target domain is small and the raw crawl is huge.

    Returns (id_col, n_tokens, dsir_logw) for every raw document.

    Determinism: per-token terms are rounded to 9dp and summed in
    DECIMAL(38,12) — exact, order-insensitive, bit-identical to the SQL
    oracle (the unigram_surprisal trick).

    Scale shape: two bucket-count passes (target, raw) each collapse to
    at most 16^hex_chars rows — broadcast-sized however large the
    corpora are; scoring is one explode + one broadcast join + one
    partial-aggregated groupBy on the doc id. No Python, no driver
    loops; the only full shuffles are keyed by doc id and by the
    256-value bucket (uniform by construction — md5).
    """
    n_buckets = 16 ** hex_chars

    def toks(df: DataFrame):
        return (
            df.select(
                F.col(id_col),
                F.explode(
                    F.split(F.trim(F.lower(F.col(text_col))), " ")
                ).alias("tok"))
            .where(F.col("tok") != "")
            .select(
                F.col(id_col),
                F.substring(F.md5(F.col("tok")), 1, hex_chars)
                .alias("bucket"))
        )

    def bucket_counts(df: DataFrame, out: str):
        # Counting needs only the text column — the target corpus does
        # not have to carry the raw corpus's id column.
        b = (
            df.select(F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), " "))
                .alias("tok"))
            .where(F.col("tok") != "")
            .select(F.substring(F.md5(F.col("tok")), 1, hex_chars)
                    .alias("bucket"))
        )
        return b.groupBy("bucket").agg(F.count(F.lit(1)).alias(out))

    tgt = bucket_counts(target, "t_n")
    rw = bucket_counts(raw, "r_n")
    table = (
        tgt.join(rw, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("t_n", F.lit(0)).alias("t_n"),
            F.coalesce("r_n", F.lit(0)).alias("r_n"))
    )
    totals = table.agg(
        F.sum("t_n").alias("t_total"), F.sum("r_n").alias("r_total"))
    weights = (
        table.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                F.log((F.col("t_n") + 1).cast("double")
                      / (F.col("t_total") + n_buckets))
                - F.log((F.col("r_n") + 1).cast("double")
                        / (F.col("r_total") + n_buckets)), 9)
            .cast("decimal(38,12)").alias("logratio"))
    )
    return (
        toks(raw)
        .join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.sum("logratio").cast("double"), 6)
            .alias("dsir_logw"))
    )


def domain_cap(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    cap: int,
    seed: int = 11,
    n_salt: int = 16,
) -> DataFrame:
    """Per-domain quota sampling — the crawl-curation host cap (keep at
    most `cap` documents per domain/source so a handful of giant hosts
    cannot dominate the training mix; the move C4/RefinedWeb apply to
    common-crawl hosts). Which documents survive is decided by a seeded
    md5 order, never arrival order: reruns, retries and repartitions all
    keep the same rows, and a new seed is a fresh draw.

    Output: the kept rows plus `domain_rank` (1-based position of the
    row in its domain's seeded order; every rank ≤ cap).

    Scale shape: the naive `row_number() OVER (PARTITION BY domain)`
    puts each domain in ONE task — a hot host with 10^9 docs is a
    straggler. Instead rank twice: phase 1 partitions by (domain, salt)
    — salt = pmod(xxhash64(md5 key), n_salt), so a hot domain spreads
    over the full `n_salt` tasks (any n_salt, not just 16) — and keeps
    each salt's top `cap`;
    phase 2 ranks the ≤ n_salt×cap survivors per domain. A row in the
    true top-cap of its domain is necessarily in the top-cap of its own
    salt, so the two-phase result is EXACTLY the single-window answer
    (the q99z oracle states it as one window), while no task ever holds
    more than max(|domain|/n_salt, n_salt×cap) rows.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat_ws(
        ":", F.col(id_col).cast("string"), F.lit(str(seed))))
    keyed = df.withColumn("_key", key).withColumn(
        "_salt", F.pmod(F.xxhash64("_key"), F.lit(n_salt)))
    w_salt = Window.partitionBy(domain_col, "_salt").orderBy(
        F.col("_key").asc(), F.col(id_col).asc())
    survivors = (
        keyed.withColumn("_r", F.row_number().over(w_salt))
        .filter(F.col("_r") <= cap)
        .drop("_r", "_salt")
    )
    w_dom = Window.partitionBy(domain_col).orderBy(
        F.col("_key").asc(), F.col(id_col).asc())
    return (
        survivors.withColumn(
            "domain_rank", F.row_number().over(w_dom).cast("long"))
        .filter(F.col("domain_rank") <= cap)
        .drop("_key")
    )


def percentile_normalize(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    id_col: str,
    out_col: str = "pctile",
    round_to: int = 6,
) -> DataFrame:
    """Per-group percentile normalization of a score column: adds
    `out_col` = (rank − 0.5)/n, the mid-rank percentile of the row's
    score within its group (rank by score asc, `id_col` as the total
    deterministic tie-break). THE cross-source calibration step before
    thresholding curation signals: quality scorers drift in scale and
    shape across sources/languages, so "keep the top 30%" must be a
    per-group percentile cut, not one global score cut (CCNet applies
    its perplexity cut per language bucket for exactly this reason).

    One window per group (state bounded by the group's rows) + a
    broadcast-sized group-count join; mid-rank (not percent_rank) so
    the output is strictly inside (0, 1) — usable directly as a
    uniform-ish feature or a filter threshold. The count join is
    NULL-SAFE (`eqNullSafe`), matching the window's partitioning,
    which puts NULL group values in their own partition — rows with a
    NULL group are normalized within that group, never dropped
    (advisor r10: a plain equi-join here silently discarded them)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc())
    n = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    for g in group_cols:
        n = n.withColumnRenamed(g, f"_g_{g}")
    cond = None
    for g in group_cols:
        c = F.col(g).eqNullSafe(F.col(f"_g_{g}"))
        cond = c if cond is None else cond & c
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .join(F.broadcast(n), cond)
        .withColumn(out_col, F.round(
            (F.col("_rk") - 0.5) / F.col("_n"), round_to))
        .drop("_rk", "_n", *[f"_g_{g}" for g in group_cols])
    )


def water_fill_cap(
    counts: DataFrame,
    key_col: str,
    n_col: str,
    budget: int | DataFrame,
) -> DataFrame:
    """Water-filling allocation: the exact per-domain cap C with
    Σᵢ min(nᵢ, C) = budget — HOW to choose `domain_cap`'s cap when the
    real constraint is a global token/document budget, not a per-host
    hunch. Domains below the water level C keep everything; domains
    above it are cut to C — the allocation that maximizes the minimum
    kept fraction (and the continuous relaxation of proportional-fair
    budget splitting).

    Solved exactly in one pass over the DISTINCT count values (never
    the corpus): ascending cum sums give, for each segment between
    consecutive distinct counts [v_j, v_{j+1}), the affine total
    kept(C) = S(v_j) + C·k_above(v_j); the segment whose interval
    contains (budget − S)/k_above yields the unique real water level,
    found with one conditional-min aggregation (no iteration — the
    classic iterative water-filling collapses into sorted prefix
    algebra, the `trimmed_winsorized_mean` trick). ``budget`` may be
    an int or a 1-row DataFrame with column ``budget`` (so the budget
    itself can be computed in-plan, e.g. a fraction of the corpus).

    Returns ONE row: budget, total_n, cap (double water level; NULL
    when budget ≥ total_n — nothing needs capping), cap_floor (the
    integer cap to hand `domain_cap`; NULL likewise), kept_at_floor
    (Σ min(nᵢ, cap_floor) — ≤ budget by construction, the exact count
    the integer cap admits)."""
    if isinstance(budget, DataFrame):
        bdf = budget.select(F.col("budget").cast("long").alias("budget"))
    else:
        bdf = counts.sparkSession.range(1).select(
            F.lit(int(budget)).cast("long").alias("budget"))
    from pyspark.sql import Window

    per_val = counts.groupBy(F.col(n_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum(n_col).alias("_mass"),
    )
    w_cum = (Window.orderBy("_v")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # |distinct counts| rows: the single-partition window is bounded by
    # count-value cardinality, never domains (and never corpus rows).
    cum = per_val.select(
        "_v", "_k",
        (F.sum("_mass").over(w_cum) - F.col("_mass")).alias("_below"),
        (F.sum("_k").over(w_cum) - F.col("_k")).alias("_k_below"),
        F.lag("_v").over(Window.orderBy("_v")).alias("_v_prev"),
    )
    tot = counts.agg(F.sum(n_col).alias("total_n"),
                     F.count(F.lit(1)).alias("_n_dom"))
    # Segment [v_prev, v): kept(C) = below + C * k_above, with k_above
    # = domains whose count >= v (they all sit above the water level
    # inside this segment); v_prev defaults to 0 for the first segment.
    j = cum.crossJoin(F.broadcast(bdf)).crossJoin(F.broadcast(tot))
    k_above = F.col("_n_dom") - F.col("_k_below")
    c_cand = (F.col("budget") - F.col("_below")) / k_above
    lo = F.coalesce(F.col("_v_prev"), F.lit(0)).cast("double")
    valid = ((c_cand >= lo) & (c_cand < F.col("_v").cast("double"))
             & (F.col("budget") < F.col("total_n")))
    picked = j.agg(
        F.max("budget").alias("budget"),
        F.max("total_n").alias("total_n"),
        F.min(F.when(valid, F.round(c_cand, 6))).alias("cap"),
    )
    alloc = (
        picked.crossJoin(
            counts.select(F.col(n_col).alias("_n")))
        .groupBy("budget", "total_n", "cap")
        .agg(F.sum(
            F.when(F.col("cap").isNull(), F.col("_n"))
            .otherwise(F.least(F.col("_n"),
                               F.floor("cap")))).alias("kept_at_floor"))
    )
    return alloc.select(
        "budget", "total_n", "cap",
        F.floor("cap").alias("cap_floor"),
        F.when(F.col("cap").isNull(), F.lit(None).cast("long"))
        .otherwise(F.col("kept_at_floor")).alias("kept_at_floor"),
    )


def effective_sample_size(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
) -> DataFrame:
    """Kish effective sample size per group: ESS = (Σw)² / Σw² — the
    degeneracy diagnostic for importance weights (Kish 1965; standard
    in importance sampling / SMC). After DSIR or temperature weighting,
    n documents with wildly uneven weights behave statistically like
    ESS ≪ n documents; an ESS ratio near 1 means the weighting is
    gentle, near 1/n means one document dominates and downstream
    estimates are noise. The go/no-go check BEFORE trusting a weighted
    sample or a weighted mean.

    One partial-aggregated groupBy; for integral weights both sums are
    exact integers (beware Σw² range: |w| ≤ ~3e4 across 1e9 rows stays
    inside int64; larger weights should be pre-scaled), so the two
    final divisions are bit-identical cross-engine. NULL and negative
    weights are excluded (ESS is defined for w ≥ 0; a NULL weight is a
    missing weight, not a zero). Output: *group_cols, n (rows with
    w > 0), ess (2dp), ess_ratio (6dp)."""
    w = F.col(weight_col)
    base = df.select(*group_cols, w.alias("_w")).where(w > 0)
    agg = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_w").alias("_s1"),
        F.sum(F.col("_w") * F.col("_w")).alias("_s2"),
    )
    ess = (F.col("_s1") * F.col("_s1")) / F.col("_s2")
    return agg.select(
        *group_cols, "n",
        F.round(ess, 2).alias("ess"),
        F.round(ess / F.col("n"), 6).alias("ess_ratio"),
    )
