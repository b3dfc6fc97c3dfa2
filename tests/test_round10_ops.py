"""Round-10 additions: manifest data skipping wired into real read
paths (gold views + bucket store), khop checkpoint_dir, scoped
checkpoint-dir restoration."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# VERDICT r9 item 8 — read_pruned consumed by the gold/view read path

def test_clustered_view_manifest_prunes_and_matches(spark, tmp_path):
    """write_view_clustered_with_manifest + read_view_pruned: the
    pruned listing must open strictly fewer files than the directory
    holds, and the filtered result must equal the unpruned read
    row-for-row (pruning is invisible in the rows)."""
    from api_to_amt_data_lake_spark.sources.manifest import _data_files
    from api_to_amt_data_lake_spark.sources.parquet_io import (
        read_view_pruned,
        write_view_clustered_with_manifest,
    )

    df = spark.range(20_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("g"))
    path = str(tmp_path / "view")
    write_view_clustered_with_manifest(df, path, ["k"], n_files=16)
    assert len(_data_files(path)) == 16

    pruned, kept = read_view_pruned(spark, path, {"k": (3000, 4999)})
    assert 0 < len(kept) < 16, kept  # the manifest really pruned
    pred = F.col("k").between(3000, 4999)
    got = sorted(tuple(r) for r in pruned.filter(pred).collect())
    want = sorted(tuple(r) for r in
                  spark.read.parquet(path).filter(pred).collect())
    assert got == want and len(got) == 2000


def test_bucket_store_pruned_read_skips_untouched_buckets(
        spark, tmp_path):
    """VERDICT r9 item 8's store-side consumer: untouched buckets carry
    the previous version's files by hard link, so their per-file stats
    are OLD — a 'rows versioned since T' read through the stats
    manifest must open only the buckets touched since T, and must equal
    the full read + filter."""
    from api_to_amt_data_lake_spark.sources.bucket_store import (
        fold_bucketed,
        read_current,
        read_current_pruned,
        write_stats_manifest,
    )

    root = str(tmp_path / "store")

    def merge(cur):
        return batch if cur is None else cur.unionByName(batch)

    # Fold 1: keys 0..199 at version stamp 1.
    batch = spark.createDataFrame(
        [(i, 1) for i in range(200)], ["k", "ver"])
    fold_bucketed(spark, root, "dim", batch.select("k"), merge,
                  "k", n_buckets=16)
    # Fold 2: only keys {0, 1} (≤2 buckets touched) at stamp 2.
    batch = spark.createDataFrame([(0, 2), (1, 2)], ["k", "ver"])
    fold_bucketed(spark, root, "dim", batch.select("k"), merge,
                  "k", n_buckets=16)
    write_stats_manifest(spark, root, "dim", ["ver"])

    pruned, kept = read_current_pruned(spark, root, "dim",
                                       {"ver": (2, None)})
    # Hard-linked untouched buckets have max(ver)=1 -> skipped.
    assert 0 < len(kept) <= 2, kept
    got = sorted(tuple(r) for r in
                 pruned.filter(F.col("ver") >= 2).collect())
    want = sorted(tuple(r) for r in
                  read_current(spark, root, "dim")
                  .filter(F.col("ver") >= 2).collect())
    assert got == want and len(got) == 2


def test_q99zzj_pruned_read_hash_equals_unpruned(spark):
    """The registered query's contract: the pruned-read aggregate
    equals the same aggregate over the plain (unpruned) source read,
    and the prune genuinely dropped files at this sf."""
    from api_to_amt_data_lake_spark.plans.conformance import (
        QUERIES,
        read_table,
    )
    from api_to_amt_data_lake_spark.sources.manifest import read_pruned

    got = sorted(tuple(r) for r in
                 QUERIES["q99zzj_pruned_view_read"](spark, SF).collect())
    o = read_table(spark, SF, "orders")
    want = sorted(tuple(r) for r in (
        o.filter(F.col("o_orderkey").between(1000, 9999))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .cast("double").alias("sum_price"))).collect())
    assert got == want and len(got) > 0
    # The query left its clustered view on disk; confirm the manifest
    # prunes the listing at this sf (keys span ~6000 -> the band
    # [1000, 9999] keeps a strict subset of the 16 files... at sf0.001
    # most files survive, so just assert coverage is honest).
    import hashlib
    import tempfile
    path = os.path.join(tempfile.gettempdir(),
                        f"pruned_view_{hashlib.md5(SF.encode()).hexdigest()[:8]}")
    _, kept = read_pruned(spark, path, {"o_orderkey": (1000, 9999)})
    from api_to_amt_data_lake_spark.sources.manifest import _data_files
    assert 0 < len(kept) < len(_data_files(path))


# ---------------------------------------------------------------------------
# VERDICT r9 item 2 — khop_distances checkpoint_dir (pagerank parity)

def test_khop_checkpoint_dir_matches_local(spark, tmp_path):
    from api_to_amt_data_lake_spark.operators.graph import khop_distances

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (6, 7)], ["s", "t"])
    seeds = spark.createDataFrame([(1,)], ["node"])
    want = {(r["node"], r["dist"])
            for r in khop_distances(e, seeds, max_hops=3).collect()}
    ckpt = str(tmp_path / "ckpt")
    got = {(r["node"], r["dist"])
           for r in khop_distances(e, seeds, max_hops=3,
                                   checkpoint_dir=ckpt).collect()}
    assert got == want == {(1, 0), (2, 1), (3, 2), (6, 2), (4, 3),
                           (7, 3)}
    assert os.listdir(ckpt)  # reliable checkpoint files really landed


# ---------------------------------------------------------------------------
# ADVICE r9 — scoped checkpoint dir restoration

def test_scoped_checkpoint_dir_restores_previous(spark, tmp_path):
    """bpe_train/fuzzy_join/pagerank with checkpoint_dir must not leak
    the session-global SparkContext checkpoint dir: the previous value
    (including the unset state) is restored after the operator."""
    from api_to_amt_data_lake_spark.operators.bpe import bpe_train

    sc = spark.sparkContext
    prev = sc.getCheckpointDir()
    corpus = spark.createDataFrame(
        [("low lower lowest",), ("new newer newest",)], ["text"])
    merges = bpe_train(corpus, "text", n_merges=2,
                       checkpoint_dir=str(tmp_path / "bpe_ckpt"))
    assert merges.count() == 2
    after = sc.getCheckpointDir()
    # Restored: the unset state comes back exactly; a previously-set
    # dir is re-set (Spark nests a fresh UUID under it on re-set, so
    # prefix equality is the invariant).
    assert after == prev or (prev is not None and after is not None
                             and after.startswith(prev))


# ---------------------------------------------------------------------------
# Round-10 operators: randomized parity vs plain-Python references

def test_label_propagation_matches_python(spark):
    """Synchronous LPA must equal a dict-based reference (same
    simultaneous update, same count-desc/min-label tie-break) on a
    random graph, for several round counts."""
    import random

    from api_to_amt_data_lake_spark.operators.graph import (
        label_propagation,
        symmetrize,
    )

    rng = random.Random(5)
    edges = {(rng.randrange(30), rng.randrange(30)) for _ in range(60)}
    edges = [(a, b) for a, b in edges if a != b]
    df = symmetrize(spark.createDataFrame(edges, ["a", "b"]), "a", "b")
    sym = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]

    nodes = sorted({x for e in sym for x in e})
    for iters in (1, 2, 3):
        lab = {n: n for n in nodes}
        for _ in range(iters):
            counts: dict = {}
            for s, t in sym:
                key = (t, lab[s])
                counts[key] = counts.get(key, 0) + 1
            new = {}
            for (t, label), c in counts.items():
                best = new.get(t)
                if best is None or (-c, label) < best:
                    new[t] = (-c, label)
            lab = {t: v[1] for t, v in new.items()}
        got = {r["id"]: r["label"]
               for r in label_propagation(df, iters=iters).collect()}
        assert got == lab, iters


def test_delta_join_increment_is_exact_bag(spark):
    """(A ⋈ B) ∪ Δ must equal A' ⋈ B' as a BAG (duplicates included)
    under random splits and duplicate keys."""
    import random
    from collections import Counter

    from api_to_amt_data_lake_spark.operators.delta_agg import (
        delta_join_increment,
    )

    rng = random.Random(17)
    a_rows = [(rng.randrange(12), rng.randrange(100))
              for _ in range(80)]
    b_rows = [(rng.randrange(12), rng.randrange(100))
              for _ in range(80)]
    a_split = [rng.random() < 0.3 for _ in a_rows]
    b_split = [rng.random() < 0.3 for _ in b_rows]
    A = spark.createDataFrame(
        [r for r, s in zip(a_rows, a_split) if not s], ["k", "x"])
    dA = spark.createDataFrame(
        [r for r, s in zip(a_rows, a_split) if s], ["k", "x"])
    B = spark.createDataFrame(
        [r for r, s in zip(b_rows, b_split) if not s], ["k", "y"])
    dB = spark.createDataFrame(
        [r for r, s in zip(b_rows, b_split) if s], ["k", "y"])

    maintained = Counter(
        tuple(r) for r in A.join(B, "k").unionByName(
            delta_join_increment(A, dA, B, dB, ["k"])).collect())
    full = Counter(
        tuple(r) for r in A.unionByName(dA).join(
            B.unionByName(dB), "k").collect())
    assert maintained == full and sum(full.values()) > 0


def test_ndcg_matches_python(spark):
    """ndcg_at_k vs the textbook formula on random graded rankings,
    including all-zero-relevance queries (ndcg = 0 by convention)."""
    import math
    import random

    from api_to_amt_data_lake_spark.operators.search import ndcg_at_k

    rng = random.Random(29)
    rows = []
    for qid in range(12):
        n = rng.randint(1, 15)
        for rank in range(1, n + 1):
            rel = 0 if qid == 0 else rng.randint(0, 3)
            rows.append((qid, rank, rel))
    df = spark.createDataFrame(rows, ["q", "rank", "rel"])
    k = 10
    want = {}
    by_q: dict = {}
    for qid, rank, rel in rows:
        by_q.setdefault(qid, []).append((rank, rel))
    for qid, lst in by_q.items():
        dcg = sum(round((2 ** rel - 1) / math.log2(rank + 1), 9)
                  for rank, rel in lst if rank <= k)
        ideal = sorted(lst, key=lambda t: (-t[1], t[0]))[:k]
        idcg = sum(round((2 ** rel - 1) / math.log2(i + 1), 9)
                   for i, (_rank, rel) in enumerate(ideal, start=1))
        nd = round(round(dcg, 6) / round(idcg, 6), 6) if idcg > 0 else 0.0
        want[qid] = (round(dcg, 6), round(idcg, 6), nd)
    got = {r["q"]: (r["dcg"], r["idcg"], r["ndcg"])
           for r in ndcg_at_k(df, "q", "rank", "rel", k=k).collect()}
    assert set(got) == set(want)
    for qid in want:
        for gv, wv in zip(got[qid], want[qid]):
            assert abs(gv - wv) < 2e-6, (qid, got[qid], want[qid])
    assert got[0] == (0.0, 0.0, 0.0)  # zero-relevance convention


def test_hard_negatives_excludes_same_label(spark):
    """hard_negatives == brute-force top-k restricted to label
    mismatch (and never returns the query itself or its own label)."""
    import random

    from api_to_amt_data_lake_spark.operators.similarity import (
        hard_negatives,
    )

    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)], i % 3)
            for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = df.filter(F.col("vec_id") < 4)
    got = hard_negatives(q, df, "vec_id", "embedding", "label",
                         k=3).collect()
    assert len(got) == 12
    import math
    by_id = {i: (v, lab) for i, v, lab in rows}
    for r in got:
        qv, qlab = by_id[r["query_id"]]
        mv, mlab = by_id[r["match_id"]]
        assert mlab != qlab and r["match_id"] != r["query_id"]
        dot = sum(a * b for a, b in zip(qv, mv))
        na = math.sqrt(sum(a * a for a in qv))
        nb = math.sqrt(sum(b * b for b in mv))
        assert abs(r["cosine_sim"] - round(dot / (na * nb), 6)) < 2e-6


def test_stream_maintained_join_equals_batch(spark, tmp_path):
    """Streaming materialized join (`streaming/ivm.py`): two insert
    streams folded as tagged micro-batches must leave J exactly equal
    to the full inner join of everything folded, at every commit —
    checked at the end as a bag, plus a replayed batch id is skipped."""
    import random
    from collections import Counter

    from api_to_amt_data_lake_spark.streaming.ivm import (
        fold_join_batch,
        read_join_state,
    )

    rng = random.Random(31)
    a_rows = [(rng.randrange(9), i, rng.randrange(50))
              for i in range(60)]
    b_rows = [(rng.randrange(9), 100 + i, rng.randrange(50))
              for i in range(60)]
    root = str(tmp_path / "jstate")
    # 4 micro-batches, each carrying a slice of both sides.
    for bi in range(4):
        a_slice = [(k, aid, x, "a") for k, aid, x in a_rows[bi::4]]
        b_slice = [(k, bid, y, "b") for k, bid, y in b_rows[bi::4]]
        batch = spark.createDataFrame(
            [(k, v1 if s == "a" else None, v2 if s == "a" else None,
              v1 if s == "b" else None, v2 if s == "b" else None, s)
             for k, v1, v2, s in a_slice + b_slice],
            ["k", "a_id", "a_x", "b_id", "b_y", "_side"])
        assert fold_join_batch(spark, batch, bi, root, ["k"]) is True
    # Replay is skipped.
    n_before = read_join_state(spark, root).count()
    batch = spark.createDataFrame(
        [(1, 999, 1, None, None, "a")],
        "k long, a_id long, a_x long, b_id long, b_y long, "
        "_side string")
    assert fold_join_batch(spark, batch, 3, root, ["k"]) is False
    assert read_join_state(spark, root).count() == n_before

    got = Counter(tuple(r) for r in read_join_state(spark, root)
                  .select("k", "a_id", "a_x", "b_id", "b_y").collect())
    A = spark.createDataFrame(a_rows, ["k", "a_id", "a_x"])
    B = spark.createDataFrame(b_rows, ["k", "b_id", "b_y"])
    want = Counter(tuple(r) for r in A.join(B, "k")
                   .select("k", "a_id", "a_x", "b_id", "b_y").collect())
    assert got == want and sum(want.values()) > 0


def test_rebuild_warns_when_gate_cannot_run(spark, tmp_path):
    """ADVICE r9 (low): rebuild_ann_index with holdout_queries but no
    previous generation must warn that the candidate ships ungated."""
    import warnings as _warnings

    from api_to_amt_data_lake_spark.sources.ann_index import (
        rebuild_ann_index,
    )

    e = spark.read.parquet(os.path.join(SF, "embeddings.parquet")) \
        .select("vec_id", "embedding")
    probes = e.filter(F.col("vec_id") < 3)
    root = str(tmp_path / "fresh_idx")
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        gen = rebuild_ann_index(spark, e, root, kc=4, coarse_iters=2,
                                m=2, k=4, iters=2,
                                holdout_queries=probes)
    assert gen == 1
    msgs = [str(w.message) for w in caught]
    assert any("UNGATED" in m for m in msgs), msgs


def test_cohens_kappa_matches_python(spark):
    """cohens_kappa vs the textbook formula on random label pairs,
    grouped and ungrouped, including a constant-label group (pe=1 →
    kappa=0 by convention) and a no-shared-label group (pe=0)."""
    import random

    from api_to_amt_data_lake_spark.operators.aggregates import (
        cohens_kappa,
    )

    rng = random.Random(13)
    rows = [("g1", rng.randrange(3), rng.randrange(3))
            for _ in range(200)]
    rows += [("g2", 0, 0)] * 20                  # constant labels: pe=1
    rows += [("g3", 0, 1), ("g3", 0, 1), ("g3", 2, 3)]  # disjoint labels
    df = spark.createDataFrame(rows, ["g", "a", "b"])

    def py_kappa(sub):
        n = len(sub)
        po = sum(a == b for _g, a, b in sub) / n
        ca: dict = {}
        cb: dict = {}
        for _g, a, b in sub:
            ca[a] = ca.get(a, 0) + 1
            cb[b] = cb.get(b, 0) + 1
        pe = sum(ca[k] * cb.get(k, 0) for k in ca) / (n * n)
        kap = (po - pe) / (1 - pe) if pe < 1 else 0.0
        return n, round(po, 6), round(pe, 6), round(kap, 6)

    got = {r["g"]: (r["n"], r["po"], r["pe"], r["kappa"])
           for r in cohens_kappa(df, "a", "b", ["g"]).collect()}
    for g in ("g1", "g2", "g3"):
        want = py_kappa([r for r in rows if r[0] == g])
        assert got[g][0] == want[0]
        for gv, wv in zip(got[g][1:], want[1:]):
            assert abs(gv - wv) < 2e-6, (g, got[g], want)
    assert got["g2"][3] == 0.0   # pe=1 convention
    assert got["g3"][2] == 0.0   # disjoint labels -> pe=0, group kept

    # Ungrouped: one row, same math over everything.
    allk = cohens_kappa(df, "a", "b").collect()
    assert len(allk) == 1
    want = py_kappa(rows)
    assert allk[0]["n"] == want[0]
    assert abs(allk[0]["kappa"] - want[3]) < 2e-6


def test_precision_recall_at_k_matches_python(spark):
    import random

    from api_to_amt_data_lake_spark.operators.search import (
        precision_recall_at_k,
    )

    rng = random.Random(37)
    rows = []
    for qid in range(10):
        n = rng.randint(1, 18)
        for rank in range(1, n + 1):
            rel = 0 if qid == 0 else rng.randint(0, 2)
            rows.append((qid, rank, rel))
    df = spark.createDataFrame(rows, ["q", "rank", "rel"])
    k = 8
    got = {r["q"]: (r["n_rel_at_k"], r["n_rel_total"], r["precision"],
                    r["recall"])
           for r in precision_recall_at_k(df, "q", "rank", "rel",
                                          k=k).collect()}
    by_q: dict = {}
    for qid, rank, rel in rows:
        by_q.setdefault(qid, []).append((rank, rel))
    for qid, lst in by_q.items():
        ak = sum(1 for rank, rel in lst if rank <= k and rel > 0)
        tot = sum(1 for _rank, rel in lst if rel > 0)
        rec = round(ak / tot, 6) if tot else 0.0
        assert got[qid] == (ak, tot, round(ak / k, 6), rec), qid
    assert got[0] == (0, 0, 0.0, 0.0)


def test_percentile_normalize_invariants(spark):
    """Per-group: values form the exact mid-rank grid {(i-0.5)/n},
    ordering follows (score, id), and groups don't interact."""
    import random

    from api_to_amt_data_lake_spark.operators.sampling import (
        percentile_normalize,
    )

    rng = random.Random(19)
    rows = [(i, "g%d" % (i % 3), rng.randrange(20)) for i in range(90)]
    df = spark.createDataFrame(rows, ["id", "g", "score"])
    out = percentile_normalize(df, ["g"], "score", "id").collect()
    by_g: dict = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r)
    for g, lst in by_g.items():
        n = len(lst)
        grid = sorted(round((i - 0.5) / n, 6) for i in range(1, n + 1))
        assert sorted(r["pctile"] for r in lst) == grid
        ordered = sorted(lst, key=lambda r: (r["score"], r["id"]))
        pcts = [r["pctile"] for r in ordered]
        assert pcts == sorted(pcts)  # monotone in (score, id)


def test_ivfpq_refine_recovers_recall(spark):
    """ivfpq_topk_refined: (a) the refined top-k is exactly the exact
    re-rank of the ADC top-refine_from (construction parity), and
    (b) refined recall@k vs the true exact top-k is >= plain ADC
    recall@k on the same queries (the point of the refine stage)."""
    from pyspark.sql import Window

    from api_to_amt_data_lake_spark.operators.similarity import (
        ivfpq_fit,
        ivfpq_topk,
        ivfpq_topk_refined,
        sq_euclidean,
    )

    e = spark.read.parquet(os.path.join(SF, "embeddings.parquet")) \
        .select("vec_id", "embedding")
    coarse, book, codes = ivfpq_fit(e, "vec_id", "embedding", kc=4,
                                    coarse_iters=2, m=2, k=4, iters=2)
    q = e.filter(F.col("vec_id") < 8)
    k, m_ref = 3, 10
    refined = ivfpq_topk_refined(q, coarse, book, codes, e, "vec_id",
                                 "embedding", m=2, k=k,
                                 refine_from=m_ref, nprobe=1)
    plain = ivfpq_topk(q, coarse, book, codes, "vec_id", "embedding",
                       m=2, k=m_ref, nprobe=1)

    # (a) construction parity: re-rank plain's candidates exactly.
    qv = q.select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("_qv"))
    mv = e.select(F.col("vec_id").alias("match_id"),
                  F.col("embedding").alias("_mv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("exact_dist").asc(), F.col("match_id").asc())
    want = (plain.select("query_id", "match_id")
            .join(qv, "query_id").join(mv, "match_id")
            .select("query_id", "match_id",
                    F.round(sq_euclidean(F.col("_qv"), F.col("_mv")),
                            6).alias("exact_dist"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
    assert sorted(map(tuple, refined.collect())) == \
        sorted(map(tuple, want.collect()))

    # (b) recall: refined >= plain ADC top-k against the exact top-k.
    exact = (e.crossJoin(F.broadcast(qv))
             .filter(F.col("vec_id") != F.col("query_id"))
             .withColumn("_d", F.round(sq_euclidean(
                 F.col("_qv"), F.col("embedding")), 6))
             .withColumn("_rk", F.row_number().over(
                 Window.partitionBy("query_id").orderBy(
                     F.col("_d").asc(), F.col("vec_id").asc())))
             .filter(F.col("_rk") <= k)
             .select("query_id", F.col("vec_id").alias("match_id")))
    hits_ref = refined.join(exact, ["query_id", "match_id"],
                            "left_semi").count()
    hits_adc = plain.filter(F.col("rank") <= k) \
        .join(exact, ["query_id", "match_id"], "left_semi").count()
    assert hits_ref >= hits_adc


def test_grouped_auc_matches_python(spark):
    """grouped_auc vs a tie-aware reference AUC (average ranks) on
    random scores with deliberate ties, plus the degenerate
    single-class convention (auc = 0.5, flagged by the zero count)."""
    import random

    from api_to_amt_data_lake_spark.operators.evaluation import (
        grouped_auc,
    )

    rng = random.Random(43)
    rows = [("g1", rng.randrange(12) / 12.0, rng.randrange(2))
            for _ in range(300)]
    rows += [("g2", rng.random(), 1)] * 10  # positives only
    df = spark.createDataFrame(rows, ["g", "s", "y"])
    got = {r["g"]: (r["n_pos"], r["n_neg"], r["auc"])
           for r in grouped_auc(df, ["g"], "s", "y").collect()}

    sub = [(s, y) for g, s, y in rows if g == "g1"]
    order = sorted(range(len(sub)), key=lambda i: sub[i][0])
    ranks = [0.0] * len(sub)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and sub[order[j]][0] == sub[order[i]][0]:
            j += 1
        avg = (i + 1 + j) / 2.0  # average of ranks i+1..j
        for t in range(i, j):
            ranks[order[t]] = avg
        i = j
    n_pos = sum(y for _s, y in sub)
    n_neg = len(sub) - n_pos
    rpos = sum(r for r, (_s, y) in zip(ranks, sub) if y)
    want = round((rpos - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * n_neg), 6)
    assert got["g1"][0] == n_pos and got["g1"][1] == n_neg
    assert abs(got["g1"][2] - want) < 2e-6, (got["g1"], want)
    assert got["g2"] == (10, 0, 0.5)  # degenerate: chance + zero count


def test_calibration_ece_matches_python(spark):
    import random

    from api_to_amt_data_lake_spark.operators.evaluation import (
        calibration_ece,
    )

    rng = random.Random(47)
    rows = [("g", rng.randrange(1000) / 1000.0,
             1 if rng.random() < 0.5 else 0) for _ in range(400)]
    rows.append(("g", 1.0, 1))  # score exactly 1.0 -> clamped to bin 9
    df = spark.createDataFrame(rows, ["g", "s", "y"])
    out = calibration_ece(df, ["g"], "s", "y", n_bins=10).collect()
    assert len(out) == 1 and out[0]["n"] == len(rows)

    bins: dict = {}
    for _g, s, y in rows:
        b = min(int(s * 10), 9)
        bins.setdefault(b, []).append((round(s, 9), y))
    num = 0.0
    for b, lst in bins.items():
        conf = round(sum(s for s, _y in lst) / len(lst), 6)
        acc = round(sum(y for _s, y in lst) / len(lst), 6)
        num += len(lst) * abs(acc - conf)
    want = round(num / len(rows), 6)
    assert abs(out[0]["ece"] - want) < 2e-6, (out[0]["ece"], want)
