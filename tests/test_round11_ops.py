"""Round-11 tests: advisor-r10 contract fixes.

- label_propagation on DIRECTED graphs: in-edge-less nodes keep their
  previous label (their out-votes must not vanish after round 1).
- fold_join_batch: unprefixed payload columns raise instead of being
  silently dropped from the maintained join.
- percentile_normalize: NULL group values form their own group and are
  normalized, never dropped.
- expire_superseded: early expiry removes the .crc sidecar with the
  parquet file (parity with _sweep_uncommitted).
"""
import os

from pyspark.sql import functions as F


def test_label_propagation_directed_keeps_voteless_nodes(spark):
    """Standard synchronous LPA on a DIRECTED graph: a node with no
    in-edges keeps its label each round, and keeps voting with it.
    Chain 0→1→2: after 2 rounds node 2 must carry node 0's label —
    the pre-fix code lost node 0 from the label table after round 1,
    so node 1 had no voter in round 2 (and the result dropped rows)."""
    from api_to_amt_data_lake_spark.operators.graph import (
        label_propagation,
    )

    df = spark.createDataFrame([(0, 1), (1, 2)], ["s", "t"])
    got = {r["id"]: r["label"]
           for r in label_propagation(df, iters=2).collect()}
    # Round 1: 1<-0's label(0), 2<-1's label(1); 0 keeps 0.
    # Round 2: 1<-0's label(0), 2<-1's round-1 label(0); 0 keeps 0.
    assert got == {0: 0, 1: 0, 2: 0}


def test_label_propagation_directed_matches_python(spark):
    """Directed LPA == a dict reference in which voteless nodes carry
    their previous label, on a random directed graph."""
    import random

    from api_to_amt_data_lake_spark.operators.graph import (
        label_propagation,
    )

    rng = random.Random(11)
    edges = {(rng.randrange(25), rng.randrange(25)) for _ in range(50)}
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["s", "t"])
    nodes = sorted({x for e in edges for x in e})
    for iters in (1, 2, 3):
        lab = {n: n for n in nodes}
        for _ in range(iters):
            counts: dict = {}
            for s, t in edges:
                key = (t, lab[s])
                counts[key] = counts.get(key, 0) + 1
            best: dict = {}
            for (t, label), c in counts.items():
                cand = (-c, label)
                if t not in best or cand < best[t]:
                    best[t] = cand
            lab = {n: best.get(n, (0, lab[n]))[1] for n in nodes}
        got = {r["id"]: r["label"]
               for r in label_propagation(df, iters=iters).collect()}
        assert got == lab, iters


def test_fold_join_batch_rejects_unprefixed_payload(spark, tmp_path):
    """The tagged-union contract is enforced: a payload column with
    neither a_/b_ prefix raises ValueError (advisor r10 — it used to
    be silently dropped from the maintained join)."""
    import pytest

    from api_to_amt_data_lake_spark.streaming.ivm import fold_join_batch

    batch = spark.createDataFrame(
        [(1, "a", "x", None), (1, "b", None, "y")],
        ["k", "_side", "a_val", "payload"])
    with pytest.raises(ValueError, match="payload"):
        fold_join_batch(spark, batch, 1, str(tmp_path / "j"), ["k"])


def test_percentile_normalize_keeps_null_group_rows(spark):
    """Rows with a NULL group value are their own window partition and
    must survive the group-count join (eqNullSafe), normalized among
    themselves."""
    from api_to_amt_data_lake_spark.operators.sampling import (
        percentile_normalize,
    )

    df = spark.createDataFrame(
        [("g1", 1.0, 1), ("g1", 2.0, 2),
         (None, 3.0, 3), (None, 5.0, 4)],
        ["g", "score", "id"])
    out = percentile_normalize(df, ["g"], "score", "id")
    rows = {r["id"]: r["pctile"] for r in out.collect()}
    assert len(rows) == 4, "NULL-group rows were dropped"
    # Two NULL-group rows: mid-rank percentiles 0.25 and 0.75.
    assert rows[3] == 0.25 and rows[4] == 0.75
    assert rows[1] == 0.25 and rows[2] == 0.75


def test_grouped_average_precision_matches_python(spark):
    """AP must equal the step-wise reference (one step per DISTINCT
    score, ties moving together — the sklearn definition) on random
    scored data with deliberate ties."""
    import random

    from api_to_amt_data_lake_spark.operators.evaluation import (
        grouped_average_precision,
    )

    rng = random.Random(7)
    rows = [("g%d" % (i % 3), round(rng.random() * 10) / 10.0,
             rng.randrange(2)) for i in range(300)]
    df = spark.createDataFrame(rows, ["g", "score", "label"])

    def ap_ref(pairs):
        from collections import defaultdict
        by_score = defaultdict(lambda: [0, 0])
        for s, y in pairs:
            by_score[s][0] += 1
            by_score[s][1] += y
        n_pos = sum(v[1] for v in by_score.values())
        if n_pos == 0:
            return 0.0
        tp = n = 0
        ap = 0.0
        for s in sorted(by_score, reverse=True):
            c, pos = by_score[s]
            tp += pos
            n += c
            ap += pos / n_pos * (tp / n)
        return ap

    got = {r["g"]: (r["n_pos"], r["n_neg"], r["ap"])
           for r in grouped_average_precision(
               df, ["g"], "score", "label").collect()}
    for grp in ("g0", "g1", "g2"):
        pairs = [(s, y) for g, s, y in rows if g == grp]
        n_pos = sum(y for _, y in pairs)
        assert got[grp][0] == n_pos
        assert got[grp][1] == len(pairs) - n_pos
        assert abs(got[grp][2] - ap_ref(pairs)) < 1e-6, grp


def test_grouped_average_precision_degenerate_groups(spark):
    """No-positive groups report ap=0.0 with n_pos=0 (flagged, never a
    crash); all-positive groups fall out as ap=1.0."""
    from api_to_amt_data_lake_spark.operators.evaluation import (
        grouped_average_precision,
    )

    df = spark.createDataFrame(
        [("none", 0.1, 0), ("none", 0.9, 0),
         ("all", 0.2, 1), ("all", 0.8, 1),
         ("perfect", 0.9, 1), ("perfect", 0.1, 0)],
        ["g", "score", "label"])
    got = {r["g"]: r for r in grouped_average_precision(
        df, ["g"], "score", "label").collect()}
    assert (got["none"]["ap"], got["none"]["n_pos"]) == (0.0, 0)
    assert got["all"]["ap"] == 1.0
    assert got["perfect"]["ap"] == 1.0  # positive ranked first


def test_signed_join_fold_maintains_join_aggregate(spark):
    """fold_grouped_sums_signed(state, delta_join_signed(...)) must
    equal the from-scratch grouped sums of A_new ⋈ B_new under random
    inserts, updates, and deletes on BOTH sides — the general (non-
    insert-only) join-IVM algebra."""
    import random

    from api_to_amt_data_lake_spark.operators.delta_agg import (
        delta_join_signed,
        fold_grouped_sums_signed,
        grouped_sums,
        signed_changes,
    )
    from api_to_amt_data_lake_spark.sources.incremental import (
        frame_changes,
    )

    rng = random.Random(21)

    def make_a(n):
        return {f"a{i}": (rng.randrange(8), rng.randrange(5))
                for i in range(n)}  # key -> (join key, group)

    def make_b(n):
        return {f"b{i}": (rng.randrange(8), rng.randrange(3) + 1)
                for i in range(n)}  # key -> (join key, value)

    a_old_d, b_old_d = make_a(30), make_b(25)
    a_new_d = dict(a_old_d)
    b_new_d = dict(b_old_d)
    for k in list(a_new_d)[:8]:
        if rng.random() < 0.5:
            del a_new_d[k]
        else:
            a_new_d[k] = (rng.randrange(8), rng.randrange(5))
    for i in range(5):
        a_new_d[f"a_ins{i}"] = (rng.randrange(8), rng.randrange(5))
    for k in list(b_new_d)[:6]:
        if rng.random() < 0.5:
            del b_new_d[k]
        else:
            b_new_d[k] = (rng.randrange(8), rng.randrange(3) + 1)
    for i in range(4):
        b_new_d[f"b_ins{i}"] = (rng.randrange(8), rng.randrange(3) + 1)

    def df_a(d):
        return spark.createDataFrame(
            [(k, j, g) for k, (j, g) in d.items()], ["_k", "jk", "grp"])

    def df_b(d):
        return spark.createDataFrame(
            [(k, j, v) for k, (j, v) in d.items()], ["_k", "jk", "val"])

    a_old, a_new = df_a(a_old_d), df_a(a_new_d)
    b_old, b_new = df_b(b_old_d), df_b(b_new_d)
    d_a = signed_changes(
        frame_changes(a_old, a_new, "_k", include_old=True),
        ["jk", "grp"])
    d_b = signed_changes(
        frame_changes(b_old, b_new, "_k", include_old=True),
        ["jk", "val"])
    delta = delta_join_signed(a_old.drop("_k"), d_a,
                              b_old.drop("_k"), d_b, ["jk"])
    state = grouped_sums(a_old.drop("_k").join(b_old.drop("_k"), "jk"),
                         ["grp"], ["val"])
    folded = fold_grouped_sums_signed(state, delta, ["grp"], ["val"])
    want = grouped_sums(a_new.drop("_k").join(b_new.drop("_k"), "jk"),
                        ["grp"], ["val"])
    got = sorted(map(tuple, folded.collect()))
    exp = sorted(map(tuple, want.collect()))
    assert got == exp


def test_signed_join_delta_never_shuffles_the_base(spark):
    """Plan pin for the r11 claim: with size-known (checkpointed/CDC)
    deltas, every delta_join_signed term plans as a broadcast-hash
    probe of the base — zero SortMergeJoin, so the only exchanged rows
    are delta-sized. (The cluster-side point: a full recompute
    exchanges BOTH base sides per refresh.)"""
    from pyspark.sql import functions as F

    from api_to_amt_data_lake_spark.operators.delta_agg import (
        delta_join_signed,
    )

    n = 100_000
    a_old = spark.range(n).select(
        (F.col("id") % 1000).alias("k"),
        (F.col("id") % 7).alias("grp")).localCheckpoint()
    b_old = spark.range(n).select(
        (F.col("id") % 1000).alias("k"),
        (F.col("id") % 9).alias("val")).localCheckpoint()
    d_a = spark.range(50).select(
        (F.col("id") % 1000).alias("k"),
        (F.col("id") % 7).alias("grp"),
        F.lit(1).alias("_sgn")).localCheckpoint()
    d_b = spark.range(50).select(
        (F.col("id") % 1000).alias("k"),
        (F.col("id") % 9).alias("val"),
        F.lit(-1).alias("_sgn")).localCheckpoint()
    delta = delta_join_signed(a_old, d_a, b_old, d_b, ["k"])
    plan = delta._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, (
        "a base side fell into a shuffle join")
    assert plan.count("BroadcastHashJoin") >= 3


def test_mean_reciprocal_rank_matches_python(spark):
    """Grouped MRR == the textbook per-query 1/first-relevant-rank mean
    (no-relevant queries count 0) on random ranked lists."""
    import random

    from api_to_amt_data_lake_spark.operators.search import (
        mean_reciprocal_rank,
    )

    rng = random.Random(3)
    rows = []
    for q in range(40):
        for rank in range(1, rng.randrange(2, 12)):
            rows.append(("g%d" % (q % 3), q, rank, rng.randrange(3)))
    df = spark.createDataFrame(rows, ["g", "query", "rank", "rel"])

    by_group: dict = {}
    for g, q, rank, rel in rows:
        by_group.setdefault(g, {}).setdefault(q, []).append((rank, rel))
    got = {r["g"]: (r["n_queries"], r["mrr"])
           for r in mean_reciprocal_rank(
               df, ["g"], "query", "rank", "rel").collect()}
    for g, queries in by_group.items():
        rrs = []
        for q, pairs in queries.items():
            rel_ranks = [rank for rank, rel in pairs if rel > 0]
            rrs.append(round(1.0 / min(rel_ranks), 9)
                       if rel_ranks else 0.0)
        assert got[g][0] == len(queries)
        assert abs(got[g][1] - sum(rrs) / len(rrs)) < 1e-6, g


def test_best_f1_threshold_matches_python(spark):
    """Per-group best-F1 threshold == brute force over every distinct
    score (f1 desc, highest threshold tie-break), including a
    no-positive group reporting f1=0.0."""
    import random

    from api_to_amt_data_lake_spark.operators.evaluation import (
        best_f1_threshold,
    )

    rng = random.Random(9)
    rows = [("g%d" % (i % 2), round(rng.random() * 5) / 5.0,
             rng.randrange(2)) for i in range(200)]
    rows += [("empty", 0.4, 0), ("empty", 0.8, 0)]
    df = spark.createDataFrame(rows, ["g", "score", "label"])
    got = {r["g"]: r for r in best_f1_threshold(
        df, ["g"], "score", "label").collect()}

    for grp in ("g0", "g1"):
        pairs = [(s, y) for g, s, y in rows if g == grp]
        n_pos = sum(y for _, y in pairs)
        best = None
        for t in sorted({s for s, _ in pairs}, reverse=True):
            tp = sum(y for s, y in pairs if s >= t)
            n = sum(1 for s, _ in pairs if s >= t)
            f1 = round(2.0 * tp / (n + n_pos), 9) if n_pos else 0.0
            cand = (f1, t)
            if best is None or cand > best:
                best = cand
        assert got[grp]["n_pos"] == n_pos
        assert abs(got[grp]["f1"] - round(best[0], 6)) < 1e-9, grp
        assert got[grp]["threshold"] == best[1], grp
    assert got["empty"]["f1"] == 0.0 and got["empty"]["n_pos"] == 0


def test_ann_meta_is_bounded_by_bucket_count(spark, tmp_path):
    """VERDICT r10 item 3: meta.json carries a bucket → sidecar pointer
    map, never the full file list — appends grow the SIDECARS of the
    touched buckets, and meta stays O(buckets) however many shards have
    been appended."""
    import json
    import os

    from pyspark.sql import functions as F

    from api_to_amt_data_lake_spark.sources.ann_index import (
        ann_index_append,
        ann_index_search,
        build_ann_index,
        committed_files,
    )

    e = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding")
    root = str(tmp_path / "idx")
    build_ann_index(e.filter(F.col("vec_id") % 4 == 0), root,
                    "vec_id", "embedding", kc=4, coarse_iters=1,
                    m=2, k=4, iters=1)
    meta0 = json.load(open(os.path.join(root, "meta.json")))
    assert "codes_files" not in meta0
    assert set(meta0["manifest"]) == {
        d for d in os.listdir(os.path.join(root, "codes"))
        if d.startswith("bucket=")}
    size0 = os.path.getsize(os.path.join(root, "meta.json"))
    files0 = committed_files(root)

    for i in (1, 2, 3):
        ann_index_append(spark, root,
                         e.filter(F.col("vec_id") % 4 == i))
    meta1 = json.load(open(os.path.join(root, "meta.json")))
    size1 = os.path.getsize(os.path.join(root, "meta.json"))
    files1 = committed_files(root)
    assert len(files1) > len(files0)  # appends committed files...
    assert len(meta1["manifest"]) <= 4  # ...but meta stays per-bucket
    # Pointer map entries are fixed-size names; 3 appends must not grow
    # meta by anything close to the file-list growth.
    assert size1 - size0 < 200 * len(meta1["manifest"])
    # Every committed file resolves through a sidecar and search works.
    assert all("/" in f for f in files1)
    q = e.filter(F.col("vec_id") < 3)
    assert ann_index_search(spark, root, q, k=2, nprobe=2).count() > 0


def test_expire_superseded_removes_crc_sidecars(tmp_path):
    """Early expiry must take the LocalFileSystem .crc sidecar with the
    parquet file, like the writer-op sweep does."""
    import json

    from api_to_amt_data_lake_spark.sources.ann_index import (
        expire_superseded,
    )

    root = tmp_path / "idx"
    codes = root / "codes"
    codes.mkdir(parents=True)
    f = codes / "part-old.parquet"
    f.write_bytes(b"x")
    crc = codes / ".part-old.parquet.crc"
    crc.write_bytes(b"c")
    (root / "meta.json").write_text(json.dumps({
        "codes_files": [],
        "superseded": {"part-old.parquet": 0.0},
    }))
    removed = expire_superseded(str(root), min_age_seconds=0.0)
    assert removed == ["part-old.parquet"]
    assert not f.exists()
    assert not crc.exists(), "orphaned .crc sidecar"


def test_trimmed_winsorized_mean_known_values(spark):
    """[0,1,2,3,9,100], trim 0.2 -> l=1: drop 0 and 100.
    trimmed = (1+2+3+9)/4 = 3.75
    winsorized = (15 + 1*(1+9))/6 = 25/6 (clamp 0->1, 100->9)."""
    from api_to_amt_data_lake_spark.operators.aggregates import (
        trimmed_winsorized_mean,
    )

    rows = [("g", v) for v in (0, 1, 2, 3, 9, 100)]
    df = spark.createDataFrame(rows, ["g", "v"])
    [r] = trimmed_winsorized_mean(df, "g", "v", trim=0.2).collect()
    assert (r["n"], r["n_trim"]) == (6, 1)
    assert r["trimmed_mean"] == 3.75
    assert r["winsorized_mean"] == round(25 / 6, 6)


def test_trimmed_mean_duplicate_value_straddles_cut(spark):
    """[1,1,1,2,3], trim 0.2 -> l=1: ONE of the three 1-rows is
    trimmed (kept=2 for value 1), plus the 3.
    trimmed = (1+1+2)/3; winsorized = (4 + 1*(1+2))/5 = 1.4."""
    from api_to_amt_data_lake_spark.operators.aggregates import (
        trimmed_winsorized_mean,
    )

    rows = [("g", v) for v in (1, 1, 1, 2, 3)]
    df = spark.createDataFrame(rows, ["g", "v"])
    [r] = trimmed_winsorized_mean(df, "g", "v", trim=0.2).collect()
    assert r["trimmed_mean"] == round(4 / 3, 6)
    assert r["winsorized_mean"] == 1.4


def test_trimmed_mean_zero_trim_is_plain_mean_and_bad_trim_raises(spark):
    from api_to_amt_data_lake_spark.operators.aggregates import (
        trimmed_winsorized_mean,
    )

    rows = [("g", v) for v in (1, 2, 3, None, 10)]
    df = spark.createDataFrame(rows, ["g", "v"])
    [r] = trimmed_winsorized_mean(df, "g", "v", trim=0.0).collect()
    assert r["n"] == 4  # NULL excluded
    assert r["trimmed_mean"] == r["winsorized_mean"] == 4.0
    import pytest
    with pytest.raises(ValueError):
        trimmed_winsorized_mean(df, "g", "v", trim=0.5)


def test_trimmed_mean_matches_python_reference(spark):
    """Random multiset per group == sort-and-slice reference."""
    import random

    from api_to_amt_data_lake_spark.operators.aggregates import (
        trimmed_winsorized_mean,
    )

    rng = random.Random(11)
    rows = [(f"g{i % 3}", rng.randint(0, 30)) for i in range(200)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r["g"]: r for r in
           trimmed_winsorized_mean(df, "g", "v", trim=0.1).collect()}
    for g in ("g0", "g1", "g2"):
        vs = sorted(v for gg, v in rows if gg == g)
        n = len(vs)
        l = int(0.1 * n)
        kept = vs[l:n - l]
        trimmed = sum(kept) / (n - 2 * l)
        winsor = (sum(kept) + l * (kept[0] + kept[-1])) / n
        assert got[g]["trimmed_mean"] == round(trimmed, 6), g
        assert got[g]["winsorized_mean"] == round(winsor, 6), g


def test_kmv_jaccard_matrix_exact_when_k_covers_union(spark):
    """k >= |union| makes the KMV estimate EXACT: merged holds every
    union uniform, n_both = |A∩B|. A={0..19}, B={10..29} -> 10/30."""
    from api_to_amt_data_lake_spark.operators.sketches import (
        kmv_jaccard_matrix,
    )

    rows = [("a", v) for v in range(20)] + \
           [("b", v) for v in range(10, 30)]
    df = spark.createDataFrame(rows, ["src", "item"])
    [r] = kmv_jaccard_matrix(df, "src", "item", k=128).collect()
    assert (r["key_a"], r["key_b"]) == ("a", "b")
    assert (r["k_used"], r["n_both"]) == (30, 10)
    assert r["jaccard"] == round(10 / 30, 6)


def test_kmv_jaccard_matrix_identical_and_disjoint(spark):
    from api_to_amt_data_lake_spark.operators.sketches import (
        kmv_jaccard_matrix,
    )

    rows = ([("a", v) for v in range(50)]
            + [("b", v) for v in range(50)]          # == a
            + [("c", v) for v in range(100, 150)])   # disjoint
    df = spark.createDataFrame(rows, ["src", "item"])
    got = {(r["key_a"], r["key_b"]): r["jaccard"]
           for r in kmv_jaccard_matrix(df, "src", "item", k=64).collect()}
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == 0.0 and got[("b", "c")] == 0.0


def test_kmv_jaccard_truncated_sketch_is_plausible(spark):
    """k < |union|: the estimate is approximate but must stay in [0,1]
    and land near the true 1/3 for a 200-item overlap at k=64."""
    from api_to_amt_data_lake_spark.operators.sketches import (
        kmv_jaccard_matrix,
    )

    rows = [("a", v) for v in range(200)] + \
           [("b", v) for v in range(100, 300)]
    df = spark.createDataFrame(rows, ["src", "item"])
    [r] = kmv_jaccard_matrix(df, "src", "item", k=64).collect()
    assert r["k_used"] == 64
    assert 0.15 <= r["jaccard"] <= 0.55  # true J = 100/300


def _py_poisson_weight(u):
    cums = (0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
            0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
            0.9999167588507119, 0.9999897508033253)
    for k, c in enumerate(cums):
        if u < c:
            return k
    return 8


def test_bootstrap_mean_ci_matches_python_reference(spark):
    """Replicate the md5 uniforms + Poisson ladder + percentile-disc
    selection in pure python and demand identical output."""
    import hashlib
    import math

    from api_to_amt_data_lake_spark.operators.evaluation import (
        bootstrap_mean_ci,
    )

    rows = [("g", i, (i * 7) % 23 + 1) for i in range(40)] + \
           [("h", 100 + i, (i * 3) % 11) for i in range(25)]
    df = spark.createDataFrame(rows, ["grp", "rid", "x"])
    got = {r["grp"]: r for r in bootstrap_mean_ci(
        df, ["grp"], "x", "rid", n_boot=32, alpha=0.05, seed=11
    ).collect()}

    for grp in ("g", "h"):
        data = [(rid, x) for g2, rid, x in rows if g2 == grp]
        means = []
        for b in range(32):
            sw = wsum = 0
            for rid, x in data:
                hx = hashlib.md5(f"{rid}:{b}:11".encode()).hexdigest()
                u = (int(hx[:6], 16) + 0.5) / 16 ** 6
                w = _py_poisson_weight(u)
                sw += w * x
                wsum += w
            if wsum > 0:
                means.append(sw / wsum)
        means.sort()
        tot = len(means)
        lo = means[math.ceil(0.025 * tot) - 1]
        hi = means[math.ceil(0.975 * tot) - 1]
        r = got[grp]
        assert r["n"] == len(data)
        assert r["mean"] == round(sum(x for _, x in data) / len(data), 6)
        assert r["ci_lo"] == round(lo, 6), grp
        assert r["ci_hi"] == round(hi, 6), grp
        assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]


def test_bootstrap_mean_ci_constant_collapses_and_null_excluded(spark):
    from api_to_amt_data_lake_spark.operators.evaluation import (
        bootstrap_mean_ci,
    )

    rows = [("g", i, 5) for i in range(30)] + [("g", 99, None)]
    df = spark.createDataFrame(rows, ["grp", "rid", "x"])
    [r] = bootstrap_mean_ci(df, ["grp"], "x", "rid", n_boot=16).collect()
    assert r["n"] == 30
    assert r["mean"] == r["ci_lo"] == r["ci_hi"] == 5.0


def _py_pav(pairs):
    """Sequential pool-adjacent-violators on [(w, s)] -> fitted rates."""
    blocks = [[w, s] for w, s in pairs]  # [weight, label_sum]
    out_idx = [[i] for i in range(len(pairs))]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][1] * blocks[i + 1][0] > blocks[i + 1][1] * blocks[i][0]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            out_idx[i] += out_idx[i + 1]
            del blocks[i + 1], out_idx[i + 1]
            if i:
                i -= 1
        else:
            i += 1
    fit = [0.0] * len(pairs)
    for blk, idxs in zip(blocks, out_idx):
        for j in idxs:
            fit[j] = blk[1] / blk[0]
    return fit


def test_isotonic_calibration_matches_sequential_pav(spark):
    """The minimax-formula fit == classic sequential PAV pooling on a
    deliberately non-monotone per-bin rate profile, per group."""
    import random

    from api_to_amt_data_lake_spark.operators.evaluation import (
        isotonic_calibration,
    )

    rng = random.Random(7)
    rows = []
    for g in ("g0", "g1"):
        for i in range(400):
            s = rng.random()
            # non-monotone truth: high positives in the middle bins
            p = 0.8 if 0.3 < s < 0.6 else 0.2 if s < 0.3 else 0.5
            rows.append((g, s, 1 if rng.random() < p else 0))
    df = spark.createDataFrame(rows, ["g", "score", "y"])
    got = isotonic_calibration(df, ["g"], "score", "y", n_bins=10)
    got = {(r["g"], r["bin"]): r for r in got.collect()}

    for g in ("g0", "g1"):
        per_bin = {}
        for gg, s, y in rows:
            if gg != g:
                continue
            b = min(int(s * 10), 9)
            w, sy = per_bin.get(b, (0, 0))
            per_bin[b] = (w + 1, sy + y)
        bins_sorted = sorted(per_bin)
        fit = _py_pav([per_bin[b] for b in bins_sorted])
        for b, f in zip(bins_sorted, fit):
            r = got[(g, b)]
            assert r["n"] == per_bin[b][0]
            assert r["calibrated"] == round(f, 6), (g, b)
        # and the output is monotone non-decreasing
        cal = [got[(g, b)]["calibrated"] for b in bins_sorted]
        assert cal == sorted(cal), g


def test_bh_fdr_textbook_and_ties(spark):
    from api_to_amt_data_lake_spark.operators.evaluation import bh_fdr

    # classic: p=(.01,.02,.03,.04,.9), m=5, alpha=.05 -> reject 4,
    # all four adjusted q collapse to .05
    rows = [("g", p) for p in (0.01, 0.02, 0.03, 0.04, 0.9)]
    df = spark.createDataFrame(rows, ["g", "p"])
    out = {r["pval"]: r for r in bh_fdr(df, ["g"], "p").collect()}
    for p in (0.01, 0.02, 0.03, 0.04):
        assert out[p]["reject"] and out[p]["q_value"] == 0.05
    assert not out[0.9]["reject"] and out[0.9]["q_value"] == 0.9

    # tied p-values share rank = their cumulative count and one q
    rows = [("g", 0.01), ("g", 0.01), ("g", 0.5)]
    df = spark.createDataFrame(rows, ["g", "p"])
    out = {r["pval"]: r for r in bh_fdr(df, ["g"], "p").collect()}
    assert out[0.01]["n_tests"] == 2
    assert out[0.01]["q_value"] == 0.015  # 0.01 * 3 / 2
    assert out[0.01]["reject"] and not out[0.5]["reject"]


def test_bh_fdr_nulls_dropped_and_reverse_min_smooths(spark):
    from api_to_amt_data_lake_spark.operators.evaluation import bh_fdr

    rows = [("g", 0.8), ("g", 0.99), ("g", None)]
    df = spark.createDataFrame(rows, ["g", "p"])
    out = {r["pval"]: r for r in bh_fdr(df, ["g"], "p").collect()}
    assert set(out) == {0.8, 0.99}  # NULL p dropped
    assert out[0.8]["m"] == 2
    # q_raw(0.8) = 0.8*2/1 = 1.6, but the reverse running min pulls it
    # down to q(0.99) = 0.99 — adjusted p-values are monotone in p.
    assert out[0.99]["q_value"] == 0.99 and out[0.8]["q_value"] == 0.99


def test_conformal_threshold_finite_sample_rank(spark):
    """scores 1..9, alpha=0.1: rank = ceil(0.9*10) = 9 -> q_hat 9;
    alpha=0.5: rank = ceil(0.5*10) = 5 -> q_hat 5. A plain p90
    percentile_disc would pick ceil(0.9*9) = rank 9 too, but at
    alpha=0.5 plain picks rank 5 of 9 while conformal picks rank 5 of
    10 — the (n+1) correction shows at small n."""
    from api_to_amt_data_lake_spark.operators.evaluation import (
        conformal_threshold,
    )

    df = spark.createDataFrame([("g", v) for v in range(1, 10)],
                               ["g", "s"])
    [r] = conformal_threshold(df, ["g"], "s", alpha=0.1).collect()
    assert (r["n"], r["cal_rank"], r["q_hat"]) == (9, 9, 9)
    [r] = conformal_threshold(df, ["g"], "s", alpha=0.5).collect()
    assert (r["cal_rank"], r["q_hat"]) == (5, 5)


def test_conformal_threshold_too_small_group_is_null(spark):
    """n=3, alpha=0.1: rank = ceil(0.9*4) = 4 > n — no order statistic
    can guarantee 90% coverage from 3 points; q_hat must be NULL, not
    a silently-invalid max."""
    from api_to_amt_data_lake_spark.operators.evaluation import (
        conformal_threshold,
    )

    df = spark.createDataFrame([("g", v) for v in (1, 2, 3)],
                               ["g", "s"])
    [r] = conformal_threshold(df, ["g"], "s", alpha=0.1).collect()
    assert r["cal_rank"] == 4 and r["q_hat"] is None


def test_conformal_threshold_ties_and_coverage(spark):
    """Duplicated scores: the rank counts ROWS, not distinct values;
    and on a 199-point calibration set the accept rule covers >= 90%
    of an exchangeable sample by construction."""
    from api_to_amt_data_lake_spark.operators.evaluation import (
        conformal_threshold,
    )

    vals = [(i * 13) % 50 for i in range(199)]
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "s"])
    [r] = conformal_threshold(df, ["g"], "s", alpha=0.1).collect()
    import math
    k = math.ceil(0.9 * 200)
    assert r["cal_rank"] == k
    assert r["q_hat"] == sorted(vals)[k - 1]
    assert sum(v <= r["q_hat"] for v in vals) / len(vals) >= 0.9


def test_water_fill_cap_known_segments(spark):
    """counts (10, 20, 70), budget 60: C solves 10 + 20 + 2C... work
    the segments — C in [20,70): kept = 30 + C -> C = 30. floor cap 30
    keeps 10 + 20 + 30 = 60 exactly."""
    from api_to_amt_data_lake_spark.operators.sampling import (
        water_fill_cap,
    )

    df = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 70)], ["k", "n"])
    [r] = water_fill_cap(df, "k", "n", 60).collect()
    assert (r["budget"], r["total_n"]) == (60, 100)
    assert r["cap"] == 30.0 and r["cap_floor"] == 30
    assert r["kept_at_floor"] == 60

    # budget 15 lands in the first segment [0, 10): C = 15/3 = 5.
    [r] = water_fill_cap(df, "k", "n", 15).collect()
    assert r["cap"] == 5.0 and r["kept_at_floor"] == 15

    # fractional level: budget 62 -> C = 32 in [20,70); budget 21 ->
    # C = 7.0 in [0,10).
    [r] = water_fill_cap(df, "k", "n", 62).collect()
    assert r["cap"] == 32.0
    [r] = water_fill_cap(df, "k", "n", 20).collect()
    # C = 20/3 = 6.666667 -> floor 6 keeps 18 <= budget
    assert r["cap"] == round(20 / 3, 6)
    assert r["cap_floor"] == 6 and r["kept_at_floor"] == 18


def test_water_fill_cap_budget_covers_everything(spark):
    from api_to_amt_data_lake_spark.operators.sampling import (
        water_fill_cap,
    )

    df = spark.createDataFrame(
        [("a", 10), ("b", 20)], ["k", "n"])
    [r] = water_fill_cap(df, "k", "n", 30).collect()
    assert r["cap"] is None and r["cap_floor"] is None
    assert r["kept_at_floor"] is None  # nothing capped
    [r] = water_fill_cap(df, "k", "n", 1000).collect()
    assert r["cap"] is None


def test_water_fill_cap_matches_python_scan(spark):
    """Random domain counts: the relational water level == a direct
    python solve, across a sweep of budgets (including duplicates in
    the count values)."""
    import random

    from api_to_amt_data_lake_spark.operators.sampling import (
        water_fill_cap,
    )

    rng = random.Random(23)
    counts = [rng.randint(1, 40) for _ in range(30)]
    df = spark.createDataFrame(
        [(f"d{i}", c) for i, c in enumerate(counts)], ["k", "n"])
    total = sum(counts)

    def solve(budget):
        if budget >= total:
            return None
        vs = sorted(set(counts))
        below = k_below = 0
        prev = 0
        for v in vs:
            k_here = counts.count(v)
            k_above = len(counts) - k_below
            c = (budget - below) / k_above
            if prev <= c < v:
                return c
            below += v * k_here
            k_below += k_here
            prev = v
        raise AssertionError("no segment")

    for budget in (5, 17, 100, 200, 350, total - 1, total, total + 5):
        [r] = water_fill_cap(df, "k", "n", budget).collect()
        want = solve(budget)
        if want is None:
            assert r["cap"] is None, budget
        else:
            assert r["cap"] == round(want, 6), budget
            kept = sum(min(c, int(want)) for c in counts)
            assert r["kept_at_floor"] == kept, budget


def test_bootstrap_and_conformal_multi_group_columns(spark):
    """grouped_percentiles_disc and its consumers accept multi-column
    groups: per-(lang, source) slices work end to end."""
    from api_to_amt_data_lake_spark.operators.evaluation import (
        bootstrap_mean_ci,
        conformal_threshold,
    )

    rows = [(f"l{i % 2}", f"s{i % 3}", i, (i * 7) % 13)
            for i in range(120)]
    df = spark.createDataFrame(rows, ["lang", "src", "rid", "x"])
    ci = bootstrap_mean_ci(df, ["lang", "src"], "x", "rid",
                           n_boot=8).collect()
    assert len(ci) == 6
    for r in ci:
        assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    th = conformal_threshold(df, ["lang", "src"], "x",
                             alpha=0.2).collect()
    assert len(th) == 6
    for r in th:
        assert r["q_hat"] is not None and r["cal_rank"] <= r["n"]


def test_effective_sample_size_known_values(spark):
    """Equal weights -> ESS = n (ratio 1). One dominant weight ->
    ESS ~ 1. Hand case (1,1,2): ESS = 16/6."""
    from api_to_amt_data_lake_spark.operators.sampling import (
        effective_sample_size,
    )

    rows = ([("eq", 5)] * 4
            + [("dom", 1000), ("dom", 1), ("dom", 1)]
            + [("mix", 1), ("mix", 1), ("mix", 2)]
            + [("null", None), ("null", 3), ("neg", -1), ("neg", 2)])
    df = spark.createDataFrame(rows, "g string, w int")
    out = {r["g"]: r for r in
           effective_sample_size(df, ["g"], "w").collect()}
    assert out["eq"]["n"] == 4 and out["eq"]["ess"] == 4.0
    assert out["eq"]["ess_ratio"] == 1.0
    assert out["dom"]["ess"] == round(1002**2 / 1000002, 2)  # ~1.004
    assert out["mix"]["ess"] == round(16 / 6, 2)
    assert out["null"]["n"] == 1  # NULL weight excluded
    assert out["neg"]["n"] == 1   # negative weight excluded
