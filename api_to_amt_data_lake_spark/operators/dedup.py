"""Deduplication operators for training-data pipelines.

- exact: hash-groupBy on content (one shuffle on the hash — uniform keys,
  no skew).
- MinHash + LSH: shingle → per-permutation min-hash → band → bucket join.
  The "permutations" are md5 with a per-permutation salt; taking the
  lexicographic MIN of the hex digest is a valid min-wise hash and — key
  design point — is *expressible in any SQL dialect*, so the DuckDB oracle
  can verify the Spark result bit-for-bit.
- SimHash: per-bit majority vote over token hashes (16-bit default).
- n-gram Jaccard: exact set similarity over candidate pairs from a cheap
  blocking key.

Scale notes: LSH candidate generation is the canonical 100 TB near-dup
design — the only shuffles are (a) signature groupBy on doc_id and (b) the
band-bucket self-join, whose key cardinality (band values) is high and
uniform; hot buckets (boilerplate docs) are exactly the AQE skew-join case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators.text import tokens


def exact_dedup_groups(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Group identical content: (content_hash, n_copies, keeper_id).

    Keep-policy: lowest id survives (deterministic).
    """
    return (
        df.select(F.md5(F.col(content_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def _shingle_expr(col: str, n: int) -> str:
    """SQL expr: distinct overlapping n-word shingles of word-array `col`.

    Guarded for short docs: Spark's sequence(0, -1) would generate a
    *descending* range, so docs with fewer than n words yield an empty
    shingle set explicitly.
    """
    parts = ", ".join(f"{col}[i + {k}]" for k in range(n))
    return (
        f"CASE WHEN size({col}) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size({col}) - {n}), "
        f"i -> concat_ws(' ', {parts}))) "
        f"ELSE array() END"
    )


def _spread_small_input(df: DataFrame, id_col: str) -> DataFrame:
    """Scale-adaptive input spread (guide §2.3) for operators whose
    map-side work is hundreds of ops per row (shingling, per-token
    hashing): that work runs on the SCAN's partitioning, and a small
    input — or one stored in few row groups — serializes it on a
    handful of cores while the rest idle (measured: the q04/q92
    MinHash pass ran as ONE 870 ms task at sf0.1 because the source
    parquet is a single row group). When the source exposes fewer
    partitions than the scheduler's parallelism, one cheap exchange of
    the raw rows — hashed on the id so the downstream groupBy(id)
    reuses the partitioning instead of exchanging again — unlocks full
    width. At real scale the scan already has ≥ parallelism splits and
    this is a NO-OP: big inputs are never re-exchanged."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p, F.col(id_col))
    return df


def minhash_signatures(
    df: DataFrame, id_col: str, content_col: str,
    num_hashes: int = 8, shingle_n: int = 3,
) -> DataFrame:
    """One row per doc: id + sig_0..sig_{h-1} (min salted-md5 per perm).

    Plan shape: project (no shuffle) → explode shingles → groupBy(id) with
    h partial-aggregating min()s — a single shuffle on doc id.
    """
    # explode_outer, NOT explode: a plain explode makes Catalyst infer a
    # `size(sh) > 0 AND isnotnull(sh)` filter and push it below the
    # projections, where the whole shingle expression (with split() inlined
    # per element access) is re-evaluated per row in interpreted mode —
    # measured 50×+ slowdown. With explode_outer no filter is inferred; we
    # drop the null rows (docs shorter than the shingle width) on the
    # *generated* column, which cannot be pushed below the Generate.
    shingled = (
        _spread_small_input(df, id_col)
        .select(F.col(id_col), F.split(F.trim(F.col(content_col)), " ").alias("ws"))
        .select(F.col(id_col), F.expr(_shingle_expr("ws", shingle_n)).alias("sh"))
        .select(F.col(id_col), F.explode_outer("sh").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )
    # One md5 yields FOUR 32-bit hash slices (8 hex chars each): per-perm
    # md5s made hashing the dominant signature cost (8 concat+md5 per
    # shingle); slicing ceil(h/4) md5s into h values is the standard
    # one-wide-hash-to-k-hashes trick and cuts the hash work 4×. Codegen
    # CSEs the repeated md5 across the slices of one perm. Fixed-width
    # lowercase hex keeps MIN() lexicographic == numeric.
    aggs = [
        F.min(
            F.substring(
                F.md5(F.concat(F.lit(f"perm{j // 4}:"), F.col("shingle"))),
                (j % 4) * 8 + 1, 8)
        ).alias(f"sig_{j}")
        for j in range(num_hashes)
    ]
    return shingled.groupBy(id_col).agg(*aggs)


def lsh_bands(
    sig: DataFrame, id_col: str, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """Explode a minhash signature into (id, band_idx, band_val) rows —
    the LSH blocking key. Shared by `lsh_candidate_pairs` (band self-join)
    and the composed banded-Jaccard path (`jaccard_pairs` with the band as
    the block key), so both block on identical band values."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band_idx"),
                                  F.concat(*parts).alias("band_val")))
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_val")


# A single task grinding through ~2M candidate pairs is seconds of work
# — below that, salting only adds shuffle volume and replication.
_SALT_PAIR_BUDGET = float(1 << 21)


def _auto_n_salt(banded: DataFrame, max_salt: int = 64,
                 key_cols: tuple[str, ...] = ("band_idx", "band_val"),
                 ) -> int | None:
    """Pick a salt factor from a cheap bucket-cardinality probe: one
    map-side-combined count per bucket key (the shuffle carries bucket
    COUNTS, never rows) — reduced to two scalars on the driver. That is
    a planning decision from a runtime statistic, the same kind AQE
    itself collects. `key_cols` names the self-join's bucket key
    (LSH bands here; `similarity.knn_graph` probes its IVF `bucket`).

    Cost model: a band self-join's work is QUADRATIC per bucket (a
    bucket of m rows probes ~m² pairs), so the probe aggregates
    max(m)² against the per-task share of Σm² — not row counts. Salt
    when the hottest bucket's pair work exceeds 2× the per-task target,
    where the target is the even-spread share floored by an absolute
    per-task budget (tiny-but-skewed buckets never trigger: a 30-row
    bucket is 435 pairs of work no matter how skewed the histogram
    looks). n_salt = ceil(hot_work / target) spreads the hot bucket
    back to ~target-sized slices, capped at `max_salt` (the replicated
    side grows with the salt, so unbounded salt is its own skew).
    Returns None for distributions that don't need salting.
    """
    row = (
        banded.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            F.max("_n").alias("mx"),
            F.sum((F.col("_n") * F.col("_n")).cast("double")).alias("sq"),
        )
        .first()
    )
    if not row or row["sq"] is None or row["sq"] == 0:
        return None
    parts = int(banded.sparkSession.conf.get("spark.sql.shuffle.partitions",
                                             "200"))
    target = max(row["sq"] / max(parts, 1), _SALT_PAIR_BUDGET)
    hot_work = float(row["mx"]) ** 2
    if hot_work <= 2 * target:
        return None
    return min(int(-(-hot_work // target)), max_salt)


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str, num_hashes: int = 8, bands: int = 4,
    n_salt: int | str | None = None,
    pin_signatures: bool = True,
) -> DataFrame:
    """Band the signature and bucket-join: docs sharing any band are
    candidate near-dups. Output: (id_a, id_b) distinct, id_a < id_b.

    n_salt handles the hot-bucket case — boilerplate-heavy corpora put a
    large fraction of documents into ONE band value (identical headers /
    licence blocks), and a plain self-join lands that whole bucket on a
    single task. With n_salt set, the join routes through `salted_join`:
    the left side spreads each band bucket over n_salt shuffle
    partitions and the right side replicates per salt, so the hot
    bucket's quadratic probe work runs on n_salt tasks in parallel.
    Results are identical (tests assert salted == plain on a
    boilerplate-heavy fixture). Prefer AQE skew splitting for plain
    sort-merge joins; salt when one bucket dwarfs the AQE partition
    threshold or the plan isn't SMJ. Pass n_salt="auto" to decide from
    a band-cardinality probe (`_auto_n_salt`): uniform corpora get the
    plain join, hot-bucket corpora get a salt factor sized so the
    hottest bucket spreads back to per-task granularity — no caller
    guesswork, one cheap count-aggregate of planning overhead.

    pin_signatures materializes `sig` before the self-join (the same
    localCheckpoint discipline as `connected_components`/`pagerank`):
    both join sides otherwise re-execute the entire upstream signature
    pipeline — shingle explode + h×shingles hashing — doubling the
    dominant cost (measured at 1M docs: signatures 35 s, so the
    un-pinned self-join pays ~70 s before joining). Pass False when the
    caller has already materialized `sig`.
    """
    if pin_signatures or n_salt == "auto":
        # auto mode probes the bands with an action, so the signature
        # pipeline MUST be pinned first or the probe (and then both
        # join sides) would each re-run shingling+hashing.
        sig = sig.localCheckpoint()
    banded = lsh_bands(sig, id_col, num_hashes, bands)
    if n_salt == "auto":
        n_salt = _auto_n_salt(banded)
    if n_salt:
        from api_to_amt_data_lake_spark.operators.joins import salted_join

        key = F.concat_ws("|", F.col("band_idx").cast("string"), "band_val")
        a = banded.select(F.col(id_col).alias("id_a"), key.alias("_bk"))
        b = banded.select(F.col(id_col).alias("id_b"), key.alias("_bk"))
        return (
            salted_join(a, b, "_bk", "_bk", n_salt=n_salt)
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def incremental_lsh_pairs(
    existing_sig: DataFrame, new_sig: DataFrame, id_col: str,
    num_hashes: int = 8, bands: int = 4, broadcast_new: bool = True,
    pin_new: bool = True,
) -> DataFrame:
    """Candidate pairs INTRODUCED by a new document batch against an
    already-indexed corpus: new×new plus new×existing, never
    existing×existing — those pairs were emitted when the existing batch
    was indexed, so a daily increment re-pays only the increment's share
    of the band join, not the whole corpus's.

    This is the maintenance half of the LSH design: `minhash_signatures`
    over yesterday's corpus is a stored table (the "index"); each new
    crawl batch computes ONLY its own signatures, probes the stored
    bands, and appends its signatures to the index afterward. Output is
    `lsh_candidate_pairs`-shaped — (id_a, id_b), a < b, distinct — so
    downstream verify/cluster steps compose unchanged; the union of
    every increment's pairs equals the from-scratch pair set
    (parity-tested).

    Scale shape: the new batch's band rows are tiny next to the index —
    broadcast them (`broadcast_new=True`) and the probe is a scan-speed
    broadcast join over the stored band table with NO shuffle of the
    index; for large backfill batches pass False to get the plain
    shuffle join. `pin_new` materializes the new batch's signatures once
    (they feed both the new-side and the probe-side of new×new pairs).
    """
    if pin_new:
        new_sig = new_sig.localCheckpoint()
    new_b = lsh_bands(new_sig, id_col, num_hashes, bands)
    all_b = lsh_bands(existing_sig, id_col, num_hashes, bands) \
        .unionByName(new_b)
    probe = new_b.select(F.col(id_col).alias("_nid"), "band_idx", "band_val")
    if broadcast_new:
        probe = F.broadcast(probe)
    return (
        probe.join(all_b, ["band_idx", "band_val"])
        .filter(F.col("_nid") != F.col(id_col))
        .select(
            F.least(F.col("_nid"), F.col(id_col)).alias("id_a"),
            F.greatest(F.col("_nid"), F.col(id_col)).alias("id_b"),
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame, id_col: str, content_col: str, block_col: str,
    threshold: float = 0.0, dedupe_sets: bool = False,
) -> DataFrame:
    """Exact token-set Jaccard over pairs sharing a blocking key.

    (id_a, id_b, jaccard rounded to 6dp). Blocking bounds the quadratic
    blow-up. At 100 TB the block key must be high-cardinality and uniform:
    an LSH band value (build with `minhash_signatures` → `lsh_bands`, join
    back to the docs, pass the band as `block_col` with
    `dedupe_sets=True` since each doc then carries one row per band) — NOT
    a low-cardinality attribute like source, whose biggest value would
    own one partition of the self-join.

    dedupe_sets: set True when `df` has multiple rows per id (one per
    block value); the exact-verify side then dedupes to one token set per
    id before the candidate join.
    """
    # Prefix-filtered posting join (AllPairs/PPJoin family): a pair with
    # Jaccard >= t must share a token within each side's first
    # n - ceil(t*n) + 1 tokens under any fixed global token order (plain
    # lexicographic here — any total order is correct). So only prefix
    # tokens are exploded and self-joined (at t=0.8 that is ~20% of
    # postings, ~25x fewer join matches than the full posting join), with
    # a length filter in the join condition (t <= |A|/|B| <= 1/t is
    # necessary for Jaccard >= t — halves the candidates again); the
    # candidates are then verified exactly with array_intersect over the
    # full token arrays — per-pair work, but only on the filtered
    # candidate set, which is the step that stays subquadratic at 100 TB.
    arr = df.select(
        F.col(id_col).alias("_id"),
        F.col(block_col).alias("_blk"),
        F.array_distinct(tokens(content_col)).alias("_arr"),
    ).withColumn("_ord", F.array_sort("_arr")).withColumn("_n", F.size("_arr"))
    prefix = F.expr(
        f"slice(_ord, 1, greatest(1, size(_ord) - "
        f"cast(ceil({threshold} * size(_ord)) as int) + 1))"
    )
    pref = arr.select("_id", "_blk", "_n",
                      F.posexplode(prefix).alias("_pos", "_tok"))
    t = F.lit(float(threshold))
    # PPJoin positional filter: if the shared token sits at 0-based prefix
    # position p, at most n - p tokens (it included) can still overlap, so
    # a surviving pair needs min(nA - pA, nB - pB) >= ceil(t/(1+t)*(nA+nB))
    # — the overlap any Jaccard >= t pair must reach. Pure pruning: the
    # bound is implied by the threshold, so no true pair is lost.
    overlap_ub = F.least(F.col("a._n") - F.col("a._pos"),
                         F.col("b._n") - F.col("b._pos"))
    overlap_req = F.ceil(
        (t / (F.lit(1.0) + t)) * (F.col("a._n") + F.col("b._n")))
    cand = (
        pref.alias("a")
        .join(pref.alias("b"),
              (F.col("a._blk") == F.col("b._blk"))
              & (F.col("a._tok") == F.col("b._tok"))
              & (F.col("a._id") < F.col("b._id"))
              & (F.col("b._n").cast("double") >= t * F.col("a._n"))
              & (F.col("a._n").cast("double") >= t * F.col("b._n"))
              & (overlap_ub >= overlap_req))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    sets = arr.select("_id", "_arr")
    if dedupe_sets:
        sets = sets.dropDuplicates(["_id"])
    inter = F.size(F.array_intersect(F.col("_aa"), F.col("_ab")))
    jac = F.round(
        inter.cast("double")
        / (F.size("_aa") + F.size("_ab") - inter).cast("double"),
        6,
    )
    return (
        cand.join(sets.select(F.col("_id").alias("id_a"),
                              F.col("_arr").alias("_aa")), "id_a")
        .join(sets.select(F.col("_id").alias("id_b"),
                          F.col("_arr").alias("_ab")), "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") > threshold)
    )


def simhash16(df: DataFrame, id_col: str, content_col: str,
              out_name: str = "simhash") -> DataFrame:
    """16-bit SimHash per row over whitespace tokens.

    Each token hashes to 16 bits (first 4 hex chars of md5); per bit
    position the signed token votes are summed; the sign vector
    re-assembles into an int. Pure integer arithmetic (bitwise AND on the
    hash) → bit-identical in any engine, so oracle-expressible.

    Shape: explode tokens → hash once per token → groupBy(id) with 16
    integer SUM(CASE) votes. All fixed-width ints → HashAggregate with
    map-side partial aggregation inside whole-stage codegen. (The obvious
    alternative — 16 `F.aggregate` folds over a token array column — runs
    interpreted and re-evaluates the tokenization per fold: measured ~100×
    slower.)
    """
    tok = _spread_small_input(df, id_col).select(
        F.col(id_col), F.explode_outer(tokens(content_col)).alias("_t"))
    hashed = tok.select(
        F.col(id_col),
        F.conv(F.substring(F.md5("_t"), 1, 4), 16, 10).cast("int").alias("_h"),
    )
    votes = [
        F.sum(
            F.when(F.col("_h").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
        ).alias(f"_v{i}")
        for i in range(16)
    ]
    agg = hashed.groupBy(id_col).agg(*votes)
    bits: Column = F.lit(0)
    for i in range(16):
        bits = bits + F.when(F.col(f"_v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return agg.select(F.col(id_col), bits.cast("int").alias(out_name))


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 20,
                         checkpoint_dir: str | None = None,
                         strict: bool = True,
                         stats: dict | None = None) -> DataFrame:
    """Cluster near-dup pairs into components: (id, cluster_id) where
    cluster_id is the minimum id reachable in the pair graph — the step a
    dedup pipeline runs after LSH/Jaccard pair generation to keep one
    document per duplicate CLUSTER rather than per pair.

    Min-label propagation with per-round pointer jumping: each round every
    node takes the min of (its label, its neighbors' labels), then chases
    one pointer hop (label := label-of-label). The extra self-join makes
    label depth halve each round, so convergence is O(log diameter)
    rounds, not O(diameter) — a 1M-node chain needs ~20 rounds, not 1M.
    The driver holds only the loop counter and the changed-row count.

    Lineage: the edge set is materialized ONCE up front and labels are
    re-materialized per round — `checkpoint_dir` selects reliable
    `checkpoint()` files (use on a real cluster: survives executor loss,
    frees shuffle lineage); the default `localCheckpoint()` pins blocks to
    executors and is only safe single-node.

    Convergence is verified, not assumed: if the fixpoint is not reached
    within max_iter rounds the labels would be silently wrong (a split
    component), so strict=True raises; strict=False warns and returns the
    partial labels (useful for bounded-latency best-effort runs).
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _pin(df: DataFrame) -> DataFrame:
        # eager=False: the checkpoint materializes during the round's
        # changed-count action instead of running its own job first —
        # one Spark job per round rather than two (the count touches
        # every pinned row anyway, so nothing is computed twice).
        return df.checkpoint(eager=False) if checkpoint_dir is not None \
            else df.localCheckpoint(eager=False)

    sym = _pin(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))))
    # Seed = min(id, min neighbor): the same groupBy shuffle a plain
    # distinct() would cost, but it performs round 1's propagation for
    # free — one fewer join round before the fixpoint.
    labels = _pin(
        sym.groupBy("a")
        .agg(F.min("b").alias("_mn"))
        .select(F.col("a").alias("id"),
                F.least(F.col("a"), F.col("_mn")).alias("label"))
    )
    changed = -1
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        prop = (
            sym.join(labels, sym["a"] == labels["id"])
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("label").alias("_nl"))
        )
        # The round-start label rides along as `_old`, so the convergence
        # check at the end of the round is a column compare on rows we
        # already have — re-joining `labels` to fetch it back would cost
        # an extra shuffle join per round.
        stepped = (
            labels.join(prop, "id", "left")
            .select("id", F.col("label").alias("_old"),
                    F.least(F.col("label"),
                            F.coalesce("_nl", F.col("label")))
                    .alias("label"))
        )
        # Pointer jump: labels always point at real node ids (mins of ids
        # seen), so label-of-label exists; chasing it halves chain depth.
        jump = stepped.select(F.col("id").alias("_jid"),
                              F.col("label").alias("_jlabel"))
        jumped = (
            stepped.join(jump, stepped["label"] == jump["_jid"], "left")
            .select("id", "_old",
                    F.least(F.col("label"),
                            F.coalesce("_jlabel", F.col("label")))
                    .alias("label"))
        )
        # The convergence flag rides along in the SAME materialization
        # (one extra narrow column), so checking it is a scan of the
        # pinned rows, not another join+shuffle per round.
        new_labels = _pin(
            jumped.select("id", "label",
                          (F.col("label") != F.col("_old")).alias("_chg"))
        )
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            break
    if stats is not None:
        # Observability for scale smokes: how many pointer-jumping
        # rounds the fixpoint took (expected ~log2(component diameter))
        # and whether it converged.
        stats["rounds"] = rounds
        stats["converged"] = changed == 0
    if changed != 0:
        msg = (f"connected_components did not converge within {max_iter} "
               f"rounds ({changed} labels still changing) — component "
               f"diameter exceeds 2^{max_iter}; raise max_iter")
        if strict:
            raise RuntimeError(msg)
        import warnings
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


def _distinct_span_hashes(
    df: DataFrame, id_col: str, content_col: str, span_n: int,
) -> DataFrame:
    """(id, h): the distinct n-token spans of each document, compressed to
    64-bit hashes. Shared plumbing for `span_dup_stats` (cross-corpus span
    counting) and `contamination_hits` (benchmark-overlap scan).

    The xxhash64 compression matters at scale: an 8-token span is ~50
    bytes of string; the hash is 8 bytes, so every downstream shuffle and
    broadcast moves ~6× less data. Collisions are a 2^-64-per-pair event —
    negligible against a 100 TB corpus's span count, and deterministic
    (the same inputs always produce the same output).
    """
    return (
        df.select(F.col(id_col),
                  F.split(F.trim(F.col(content_col)), " ").alias("ws"))
        # Staged select + explode_outer: same Generate-barrier shape as
        # minhash_signatures (see the comment there) so the shingle
        # expression is evaluated once per row, never inlined per element.
        .select(F.col(id_col), F.expr(_shingle_expr("ws", span_n)).alias("sh"))
        .select(F.col(id_col), F.explode_outer("sh").alias("span"))
        .filter(F.col("span").isNotNull())
        .select(F.col(id_col), F.xxhash64("span").alias("h"))
    )


def span_dup_stats(
    df: DataFrame, id_col: str, content_col: str, span_n: int = 8,
) -> DataFrame:
    """ExactSubstr-style duplicated-span statistics: for each document,
    how many of its distinct n-token spans also occur in at least one
    OTHER document, and the duplicated fraction.

    This is the distributed relaxation of suffix-array substring dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): fixed-length n-gram spans stand in for arbitrary-length
    repeated substrings, which turns the problem into two relational
    aggregations. The reference has no analog (it is an LLM-pipeline
    operator per the build brief).

    Output: (id, n_spans, n_dup_spans, dup_fraction).

    Scale shape: the per-hash document frequency is a whole-partition
    window count over the span hash (uniform 64-bit keys — no skew), so
    the span stream is scanned ONCE — the groupBy+self-join formulation
    re-executes the tokenize/explode on both sides of the join — then
    one groupBy(id) that partial-aggregates map-side. Both shuffles move
    (id, hash) pairs only, never document text.
    """
    from pyspark.sql import Window

    spans = _distinct_span_hashes(df, id_col, content_col, span_n)
    # Spans are distinct per doc (array_distinct in _shingle_expr), so a
    # plain count(*) per hash IS the distinct-document frequency.
    counted = spans.withColumn(
        "_nd", F.count(F.lit(1)).over(Window.partitionBy("h")))
    return (
        counted
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("_nd") >= 2, 1).otherwise(0)).alias("n_dup_spans"),
        )
        .withColumn(
            "dup_fraction",
            F.round(F.col("n_dup_spans") / F.col("n_spans"), 6),
        )
    )


def contamination_hits(
    corpus: DataFrame, benchmark: DataFrame, id_col: str, content_col: str,
    span_n: int = 8,
) -> DataFrame:
    """Benchmark-contamination scan: for each corpus document, how many of
    its distinct n-token spans appear anywhere in an evaluation/benchmark
    set (the standard n-gram-overlap decontamination check LLM training
    pipelines run before training).

    Output: (id, n_hit_spans, contaminated) — one row per corpus doc,
    including clean ones (n_hit_spans = 0).

    Scale shape: the benchmark side is tiny relative to a 100 TB corpus,
    so its distinct span-hash set is BROADCAST — the corpus side is
    scanned once and never shuffles for the probe; the only shuffle is
    the final groupBy(id), which partial-aggregates map-side.
    """
    spans = _distinct_span_hashes(corpus, id_col, content_col, span_n)
    bench = (
        _distinct_span_hashes(benchmark, id_col, content_col, span_n)
        .select("h").distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        spans.join(F.broadcast(bench), "h", "left")
        .groupBy(id_col)
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit_spans"))
        .withColumn("contaminated", (F.col("n_hit_spans") > 0))
    )


def jaccard_verify_pairs(
    cand: DataFrame, docs: DataFrame, id_col: str, content_col: str,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact token-set Jaccard verification of a candidate pair list:
    (id_a, id_b) -> (id_a, id_b, jaccard) keeping jaccard > threshold.

    The verify stage that follows ANY blocking scheme. Pair it with
    `lsh_candidate_pairs` when the blocks are LSH bands: band blocks are
    already tiny (only near-dup signatures collide), so the prefix-filter
    posting join in `jaccard_pairs` prunes almost nothing there while
    re-evaluating its (expensive) upstream once per self-join side —
    candidates-then-verify computes the token sets ONCE from the raw
    docs and runs two id-partitioned joins whose left side is only the
    candidate set. Keep `jaccard_pairs` for coarse blocks (length
    buckets, sources) where in-block pruning is the point.
    """
    sets = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(tokens(content_col)).alias("_arr"),
    )
    inter = F.size(F.array_intersect(F.col("_aa"), F.col("_ab")))
    jac = F.round(
        inter.cast("double")
        / (F.size("_aa") + F.size("_ab") - inter).cast("double"),
        6,
    )
    return (
        cand.join(sets.select(F.col("_id").alias("id_a"),
                              F.col("_arr").alias("_aa")), "id_a")
        .join(sets.select(F.col("_id").alias("id_b"),
                          F.col("_arr").alias("_ab")), "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") > threshold)
    )


def novelty_stats(
    new_docs: DataFrame, history: DataFrame, id_col: str, content_col: str,
    span_n: int = 8,
) -> DataFrame:
    """Crawl-novelty measurement: for each NEW document, what fraction of
    its distinct n-token spans has never been seen in the historical
    corpus — the "how much of this batch is actually new data" signal an
    incremental curation pipeline gates ingestion on.

    Output: (id, n_spans, n_novel_spans, novelty_fraction).

    Scale shape — deliberately the opposite of `contamination_hits`: the
    history side is the 100 TB corpus, far too big to broadcast, so this
    is an honest shuffle join of both span inventories on the uniform
    64-bit span hash (no skew), followed by a map-side-partial
    groupBy(id). The history inventory is the natural thing to persist
    between crawls (append-only parquet of span hashes) so each new
    batch pays one join against it, not a rescan of history.
    """
    spans = _distinct_span_hashes(new_docs, id_col, content_col, span_n)
    hist = (
        _distinct_span_hashes(history, id_col, content_col, span_n)
        .select("h").distinct()
        .withColumn("_seen", F.lit(1))
    )
    return (
        spans.join(hist, "h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("_seen").isNull(), 1).otherwise(0))
            .alias("n_novel_spans"),
        )
        .withColumn(
            "novelty_fraction",
            F.round(F.col("n_novel_spans") / F.col("n_spans"), 6),
        )
    )
