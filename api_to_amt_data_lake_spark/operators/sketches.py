"""Mergeable frequency sketches for unbounded token streams.

Exact token counting at 100 TB needs a shuffle keyed by every distinct
token (billions of keys); a count-min sketch replaces it with a
fixed-size grid of counters — `d` hash rows × `w` buckets — that is
associative and commutative, so Spark computes it as an ordinary
partial-aggregated groupBy over (row, bucket): the shuffled state is at
most d×w rows REGARDLESS of corpus size, and two sketches built on
different corpus shards merge by cell-wise addition (a unionAll +
re-groupBy). Point estimates are the min over the d rows' cells — an
upper bound on the true count with overestimate ≤ 2N/w at 1-(1/2)^d
confidence (Cormode & Muthukrishnan 2005).

Engine-portable hashing: bucket_i(token) = the first `hex_chars` hex
digits of md5(token || ':' || i) — md5 is bit-identical in every engine,
and keeping the bucket as a hex STRING avoids hex→int conversions that
SQL dialects disagree on. w is therefore 16^hex_chars.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators.text import tokens


def _bucket(tok: Column, row: int, hex_chars: int) -> Column:
    return F.substring(F.md5(F.concat(tok, F.lit(f":{row}"))), 1, hex_chars)


def cms_build(
    df: DataFrame,
    text_col: str,
    depth: int = 4,
    hex_chars: int = 2,
) -> DataFrame:
    """Count-min sketch of the whitespace-token stream of `text_col`:
    (row, bucket, cnt) with depth×16^hex_chars cells at most.

    One explode + one groupBy on (row, bucket) — the combiner collapses
    each partition to ≤ d×w rows before the shuffle, so the exchanged
    volume is constant in corpus size (the whole point vs exact counts).

    The d hash rows ride a single scan: each token row computes its d
    buckets into an array and posexplode supplies the row index — a
    d-branch unionAll would re-run the token explode per branch
    (measured 4× the runtime at depth 4 on a 4M-token corpus).
    """
    toks = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
        .where(F.col("tok") != "")
    )
    cells = toks.select(
        F.posexplode(
            F.array(*[_bucket(F.col("tok"), r, hex_chars)
                      for r in range(depth)])
        ).alias("row", "bucket")
    )
    return cells.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    hex_chars: int = 2,
) -> DataFrame:
    """Point-estimate the frequency of each token in `queries` from the
    sketch: min over the d rows of the token's cell. The sketch side is
    d×w rows — always broadcast — so estimation is a map-side join no
    matter how large the original corpus was.
    """
    probes = queries.select(F.col(token_col).alias("tok"))
    for r in range(depth):
        probes = probes.withColumn(
            f"_b{r}", _bucket(F.col("tok"), r, hex_chars)
        )
    est = probes
    for r in range(depth):
        row_cells = F.broadcast(
            sketch.where(F.col("row") == r)
            .select(F.col("bucket").alias(f"_b{r}"),
                    F.col("cnt").alias(f"_c{r}"))
        )
        est = est.join(row_cells, f"_b{r}", "left")
    return est.select(
        "tok",
        F.least(*[F.coalesce(F.col(f"_c{r}"), F.lit(0))
                  for r in range(depth)]).alias("est"),
    )


def hll_hourly_sketches(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    distinct_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """Hour-bucket HLL sketches of distinct `distinct_col` values —
    the MERGEABLE partial that makes COUNT(DISTINCT) cascade the way
    sums do in `aggregates.py::cascade_time_rollups` (plain distinct
    counts do NOT re-aggregate: |A ∪ B| != |A| + |B|). Each row is
    (bucket_start, *keys, hll: binary), ~2^lg_config_k registers —
    bounded state per bucket regardless of event volume.
    """
    return (
        df.groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("bucket_start"),
            *[F.col(k) for k in key_cols])
        .agg(F.hll_sketch_agg(F.col(distinct_col), F.lit(lg_config_k))
             .alias("hll"))
    )


def hll_rollup_estimates(
    hourly: DataFrame,
    unit: str,
    key_cols: list[str],
) -> DataFrame:
    """Roll HLL partials up to a coarser time unit and estimate:
    register-wise max (hll_union_agg) over the hour sketches, then one
    estimate per (coarser bucket, keys). Because HLL union is exact on
    the register level, the estimate from merged hourly sketches is
    IDENTICAL to sketching the raw rows of the coarser bucket directly
    (parity-checked by conformance q99y) — the distinct-count analog of
    the sum cascade, reading |hours| rows per day instead of the raw
    event stream.
    """
    return (
        hourly.groupBy(
            F.date_trunc(unit, F.col("bucket_start"))
            .alias("bucket_start"),
            *[F.col(k) for k in key_cols])
        .agg(F.hll_sketch_estimate(F.hll_union_agg(F.col("hll")))
             .alias("n_distinct"))
    )


def grid_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    bin_width: int,
) -> DataFrame:
    """Fixed-grid quantile sketch: per (keys, bin) row counts, where
    bin = floor(value / bin_width). The quantile analog of the HLL
    partial above — percentiles do NOT cascade (p90 of p90s is not the
    p90), but binned counts DO: sketches merge by cell-wise addition
    (an ordinary partial-aggregated groupBy), so a coarser-level
    quantile needs only each finer group's grid, never the raw rows.
    The grid is sparse — only non-empty bins appear — and its size is
    bounded by the value range / bin_width regardless of row count.

    Exactness contract: the bin is integer/decimal arithmetic (floor of
    an exact decimal division), bit-identical in any engine; the
    resulting quantile estimate is the true quantile rounded UP to its
    bin's upper edge — error ≤ bin_width, deterministic, and equal
    whether the grid was built directly or merged from partials
    (conformance q98d states both as one oracle).
    """
    return (
        df.groupBy(
            *[F.col(k) for k in key_cols],
            F.floor(F.col(value_col) / F.lit(bin_width))
            .cast("long").alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def grid_merge(
    sketch: DataFrame, to_keys: list[str],
) -> DataFrame:
    """Merge grid partials up to coarser keys: cell-wise addition —
    the mergeability that makes the sketch a sketch. Input rows per
    group = its bin count, so rolling a 10^9-row fact table from
    nation to region grain reads |nations|×|bins| rows, not the fact
    table."""
    return (
        sketch.groupBy(*[F.col(k) for k in to_keys], F.col("bin"))
        .agg(F.sum("cnt").alias("cnt"))
    )


def log_grid_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    growth: float = 1.1,
) -> DataFrame:
    """UNBOUNDED-domain mergeable quantile sketch: geometric bins
    bin = floor(ln(v) / ln(growth)) over POSITIVE values. Where
    `grid_sketch` needs a known [lo, hi] and pays error = one fixed
    bin width (terrible at the head of a long-tailed column),
    geometric bins need NO range at all and pin the RELATIVE error:
    a value in bin b lies in [g^b, g^(b+1)), so the bin's upper edge
    over-estimates any quantile in it by at most a factor `growth` —
    the t-digest/KLL use case (token counts, doc lengths at 100 TB)
    with grid mergeability: partials still merge by cell-wise addition
    (`grid_merge`), and the whole domain of a 64-bit column is
    ≤ log_g(2^63) bins (~460 at g=1.1) regardless of row count.

    Rows with value <= 0 are excluded (log domain) — count them
    separately if zeros matter. Engine portability: the ln ratio is
    rounded to 9dp before floor, so the ≤1-ulp libm differences
    between engines cannot flip a bin (same idiom as the round-6
    distance contract in similarity.py).
    """
    if growth <= 1.0:
        raise ValueError("growth must be > 1 (geometric bin ratio); "
                         f"got {growth}")
    b = F.floor(F.round(
        F.log(F.col(value_col).cast("double"))
        / F.lit(math.log(growth)), 9)).cast("long")
    return (
        df.where(F.col(value_col) > 0)
        .groupBy(*[F.col(k) for k in key_cols], b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def log_grid_quantiles(
    sketch: DataFrame,
    key_cols: list[str],
    growth: float = 1.1,
    pcts: list[int] = (50, 90, 99),
) -> DataFrame:
    """Per-group quantile estimates from a log-grid sketch: the first
    bin whose cumulative count reaches the percentile, estimated at the
    bin's UPPER edge g^(bin+1) — so for every percentile
    exact <= estimate <= exact * growth (the pinned relative-error
    contract conformance q98e checks against exact percentile_disc).
    Same integer threshold arithmetic as `grid_quantiles`; the edge is
    rounded to 6dp so both engines emit the identical double."""
    if growth <= 1.0:
        raise ValueError("growth must be > 1 (geometric bin ratio); "
                         f"got {growth}")
    from pyspark.sql import Window

    w_cum = Window.partitionBy(*key_cols).orderBy("bin")
    cum = (
        sketch.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn(
            "tot",
            F.sum("cnt").over(Window.partitionBy(*key_cols)))
    )
    edge = F.round(F.exp((F.col("bin") + 1) * F.lit(math.log(growth))), 6)
    aggs = [
        F.min(
            F.when(100 * F.col("cum") >= p * F.col("tot"), edge)
        ).alias(f"p{p}_est")
        for p in pcts
    ]
    return cum.groupBy(*[F.col(k) for k in key_cols]).agg(*aggs)


def grid_quantiles(
    sketch: DataFrame,
    key_cols: list[str],
    bin_width: int,
    pcts: list[int] = (50, 90, 99),
) -> DataFrame:
    """Per-group quantile estimates from a grid sketch: cumulative bin
    counts (window partitioned by the group — never partition-less),
    then for each percentile the first bin whose cumulative count
    reaches it; the estimate is that bin's upper edge. The threshold
    compare is pure integer arithmetic (100*cum >= pct*total), so no
    float rounding can flip a bin cross-engine."""
    from pyspark.sql import Window

    w_cum = Window.partitionBy(*key_cols).orderBy("bin")
    cum = (
        sketch.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn(
            "tot",
            F.sum("cnt").over(Window.partitionBy(*key_cols)))
    )
    aggs = [
        F.min(
            F.when(100 * F.col("cum") >= p * F.col("tot"),
                   (F.col("bin") + 1) * bin_width)
        ).cast("long").alias(f"p{p}_est")
        for p in pcts
    ]
    return cum.groupBy(*[F.col(k) for k in key_cols]).agg(*aggs)


def _kmv_uniform(value: Column, seed: int) -> Column:
    """Engine-portable uniform in (0,1): the first 12 hex digits of
    md5(value || ':' || seed) as a 48-bit integer, shifted off zero by
    +0.5 and scaled by 16^-12. 48 bits fit a double exactly and the
    division is a power-of-two scale, so the uniform is bit-identical
    in any engine with md5 (DuckDB oracle: ('0x' || substr(md5(...),
    1, 12))::BIGINT)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", value.cast("string"),
                              F.lit(str(seed)))), 1, 12),
        16, 10,
    ).cast("long")
    return (h.cast("double") + F.lit(0.5)) / F.lit(float(16 ** 12))


def kmv_sketch(
    df: DataFrame,
    key_cols: list[str],
    distinct_col: str,
    k: int = 128,
    seed: int = 5,
    n_merge_salts: int = 32,
) -> DataFrame:
    """K-minimum-values distinct sketch per group: the k smallest
    engine-portable uniform hashes of `distinct_col` (Bar-Yossef et
    al. 2002) as `(keys…, kmv: array<double>)` — the transparent-math
    counterpart of `hll_hourly_sketches` (HLL's register encoding is
    engine-private; a KMV array is plain doubles any engine can
    recompute, so it conformance-tests against a DuckDB oracle).

    Built as the classic two-level mergeable aggregation: level 1
    groups by (keys, salt = hash(value) mod n_merge_salts) and keeps
    each partial's k smallest uniforms (collect_set bounds memory at
    distinct/salts per task, and the partial-agg combine runs
    map-side); level 2 merges the ≤ n_merge_salts arrays by flatten +
    distinct + sort + slice — which is exactly the KMV MERGE operation
    (distinct matters: two shards that saw the same value carry the
    same uniform, and double-counting it would bias u_(k) low), so two
    sketches built on different corpus shards union the same way
    (unionAll + re-run level 2). Shuffled state is ≤ salts × k doubles
    per group regardless of corpus size."""
    u = _kmv_uniform(F.col(distinct_col), seed)
    lvl1 = (
        df.select(*key_cols, u.alias("_u"))
        .groupBy(*key_cols,
                 F.pmod(F.hash("_u"), F.lit(n_merge_salts)).alias("_s"))
        .agg(F.slice(F.array_sort(F.collect_set("_u")), 1, k)
             .alias("_part"))
    )
    return (
        lvl1.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.slice(
            F.array_sort(F.array_distinct(
                F.flatten(F.collect_list("_part")))),
            1, k).alias("kmv"))
    )


def kmv_estimate(sketch: DataFrame, k: int = 128) -> DataFrame:
    """Distinct-count estimates from KMV sketches: a full sketch (k
    values collected) estimates n̂ = (k-1)/u_(k) — the k-th smallest of
    n uniforms sits at ≈ k/(n+1), unbiased per Beyer et al. 2007 — and
    a short sketch saw every distinct value, so its size IS the exact
    count. Integer-rounded: the estimate is a count."""
    kth = F.element_at(F.col("kmv"), F.size("kmv"))
    est = F.when(
        F.size("kmv") < k, F.size("kmv").cast("double")
    ).otherwise((F.lit(float(k - 1))) / kth)
    return sketch.withColumn(
        "n_distinct_est", F.round(est).cast("long")).drop("kmv")


def minu_sketch(
    df: DataFrame,
    key_cols: list[str],
    distinct_col: str,
    k_cells: int = 256,
    seed: int = 9,
) -> DataFrame:
    """Min-uniform distinct sketch: route each value to one of
    `k_cells` cells by an md5-derived hash and keep the MINIMUM
    md5-derived uniform per (group, cell) — Flajolet-Martin-style
    stochastic averaging with transparent math instead of HLL's
    engine-private registers. Output (keys…, cell, umin), ≤ k_cells
    rows per group.

    This is the STREAMING-SAFE counterpart of `kmv_sketch`: KMV's
    k-smallest set needs collect_set state (unbounded within a task);
    a per-cell MIN is O(1) state per cell, a plain streaming-supported
    aggregate, and the merge is cell-wise min (exactly like HLL's
    register max — merged-shard == whole-corpus, bit-for-bit). Cell id
    and uniform come from DISJOINT hex ranges of one md5, so both
    reproduce in any engine: u = chars 1-12, cell = chars 13-16 (16
    bits — k_cells must be ≤ 65536; a 2-char cell range silently left
    cells beyond 256 empty forever and the estimator read the missing
    cells as sparsity, caught by the 10M-row sweep smoke)."""
    if k_cells > 16 ** 4:
        raise ValueError(f"k_cells must be <= {16 ** 4}, got {k_cells}")
    digest = F.md5(F.concat_ws(
        ":", F.col(distinct_col).cast("string"), F.lit(str(seed))))
    h = F.conv(F.substring(digest, 1, 12), 16, 10).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(16 ** 12))
    cell = F.pmod(F.conv(F.substring(digest, 13, 4), 16, 10).cast("long"),
                  F.lit(k_cells))
    return (
        df.select(*key_cols, cell.alias("cell"), u.alias("_u"))
        .groupBy(*key_cols, "cell")
        .agg(F.min("_u").alias("umin"))
    )


def minu_merge(sketches: DataFrame, key_cols: list[str]) -> DataFrame:
    """Merge min-uniform sketch partials (from shards, hours, or a
    stream's emitted windows): cell-wise MIN over the union — the
    min of mins over disjoint inputs IS the min over their union, so
    merged partials equal the sketch of the whole corpus exactly."""
    return (
        sketches.groupBy(*[F.col(c) for c in key_cols], "cell")
        .agg(F.min("umin").alias("umin"))
    )


def minu_estimate(
    sketch: DataFrame, key_cols: list[str], k_cells: int = 256,
) -> DataFrame:
    """Distinct-count estimates from min-uniform sketches, regime-
    switched the way HLL is:

    - DENSE (≥ half the cells occupied): a cell that saw n_i values
      has E[min] = 1/(n_i + 1), and with n_i ≈ n/k the sum over k
      cells is E[S] ≈ k²/(n + k); inverting, n̂ = k²/S − k with
      S = Σ umin + (k − occupied)·1.0 (an empty cell's "min of zero
      uniforms" contributes E = 1 = 1/(0+1)). Relative error ~1/√k.
    - SPARSE (< half occupied): the dense inversion is biased low
      (1/(n_i+1) is convex and the n_i ≈ n/k assumption fails for
      n ≪ k — at n = 10, k = 256 it answers ~4), so use linear
      counting on the occupancy instead: n̂ = −k·ln(empty/k)
      (Whang et al. 1990 — HLL's own small-range correction).

    Both branches are transparent arithmetic an oracle reproduces;
    `empty > 0` is guaranteed on the sparse branch."""
    kk = float(k_cells)
    occupied = F.count(F.lit(1)).cast("double")
    agg = sketch.groupBy(*[F.col(c) for c in key_cols]).agg(
        (F.sum("umin") + (F.lit(kk) - occupied)).alias("_s"),
        occupied.alias("_occ"))
    dense = F.lit(kk * kk) / F.col("_s") - F.lit(kk)
    sparse = -F.lit(kk) * F.log((F.lit(kk) - F.col("_occ")) / F.lit(kk))
    est = F.when(F.col("_occ") * 2 < kk, sparse).otherwise(dense)
    return agg.select(
        *key_cols, F.round(est).cast("long").alias("n_distinct_est"))


def kmv_jaccard_matrix(
    df: DataFrame,
    key_col: str,
    distinct_col: str,
    k: int = 128,
    seed: int = 5,
) -> DataFrame:
    """Pairwise Jaccard-similarity matrix between groups' distinct-item
    sets from their KMV sketches — "which sources/domains mirror each
    other's vocabulary (or URL set, or shingle set)?", the corpus-level
    dedup diagnostic that tells you WHERE near-duplicate mass lives
    before you pay for a document-level LSH pass.

    Estimator (Beyer et al. 2007): merge two KMV sketches (union,
    distinct, keep k smallest), then Ĵ = |merged ∩ S_a ∩ S_b| /
    |merged| — the k-smallest union uniforms are a uniform sample of
    the union, and membership in both sketches marks intersection
    elements. Deterministic: the uniforms are `_kmv_uniform`'s exact
    md5 doubles, so the sketch — and therefore the estimate — is
    bit-identical across engines and reruns.

    Scale shape: the corpus collapses to |keys| sketch rows via the
    mergeable `kmv_sketch` aggregation (shuffled state ≤ salts × k
    doubles per key); the pair join and all merge/intersect work are
    array expressions on that |keys|²/2-row table — bounded by group
    cardinality, never corpus size. Output: key_a, key_b, k_used,
    n_both, jaccard (6dp)."""
    sk = kmv_sketch(df, [key_col], distinct_col, k=k, seed=seed)
    a = sk.select(F.col(key_col).alias("key_a"),
                  F.col("kmv").alias("_ka"))
    b = sk.select(F.col(key_col).alias("key_b"),
                  F.col("kmv").alias("_kb"))
    pairs = a.join(b, F.col("key_a") < F.col("key_b"))
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat("_ka", "_kb"))), 1, k)
    scored = pairs.withColumn("_m", merged).select(
        "key_a", "key_b",
        F.size("_m").alias("k_used"),
        F.size(F.array_intersect(
            "_m", F.array_intersect("_ka", "_kb"))).alias("n_both"),
    )
    return scored.withColumn(
        "jaccard",
        F.round(F.col("n_both") / F.col("k_used"), 6))
