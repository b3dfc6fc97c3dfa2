"""Round-9 operators: KMV distinct sketch, char entropy, Pareto
frontier sweep (sketches.py / text.py / frontier.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators.frontier import pareto_frontier_2d
from api_to_amt_data_lake_spark.operators.sketches import (
    kmv_estimate,
    kmv_sketch,
)
from api_to_amt_data_lake_spark.operators.text import char_entropy


# ---------------------------------------------------------------------------
# KMV

def _vals(spark, n, group="g"):
    return spark.createDataFrame(
        [(group, i) for i in range(n)], "grp string, v long")


def test_kmv_short_sketch_is_exact(spark):
    sk = kmv_sketch(_vals(spark, 40), ["grp"], "v", k=128)
    [r] = kmv_estimate(sk, k=128).collect()
    assert r.n_distinct_est == 40


def test_kmv_full_sketch_estimates_within_bound(spark):
    # k=128 → relative error ~1/sqrt(k) ≈ 9%; allow 3 sigma.
    sk = kmv_sketch(_vals(spark, 2000), ["grp"], "v", k=128)
    [r] = kmv_estimate(sk, k=128).collect()
    assert abs(r.n_distinct_est - 2000) < 2000 * 0.27


def test_kmv_duplicates_do_not_inflate(spark):
    once = _vals(spark, 300)
    thrice = once.unionAll(once).unionAll(once)
    [a] = kmv_estimate(kmv_sketch(once, ["grp"], "v", k=64), k=64).collect()
    [b] = kmv_estimate(kmv_sketch(thrice, ["grp"], "v", k=64),
                       k=64).collect()
    assert a.n_distinct_est == b.n_distinct_est


def test_kmv_shard_merge_equals_whole(spark):
    a = _vals(spark, 500)
    b = spark.createDataFrame(
        [("g", i) for i in range(400, 900)], "grp string, v long")
    whole = kmv_sketch(a.unionAll(b), ["grp"], "v", k=64)
    # Merge = re-run level 2 over the union of the two sketches.
    merged = (
        kmv_sketch(a, ["grp"], "v", k=64)
        .unionAll(kmv_sketch(b, ["grp"], "v", k=64))
        .groupBy("grp")
        .agg(F.slice(
            F.array_sort(F.array_distinct(
                F.flatten(F.collect_list("kmv")))),
            1, 64).alias("kmv"))
    )
    [w] = whole.collect()
    [m] = merged.collect()
    assert w.kmv == m.kmv


# ---------------------------------------------------------------------------
# Char entropy

def _ent(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(char_entropy("t").alias("e")).collect()[0].e


def test_entropy_single_symbol_is_zero(spark):
    assert _ent(spark, "aaaaaa") == 0.0


def test_entropy_uniform_alphabet_is_log2(spark):
    assert math.isclose(_ent(spark, "abcd"), 2.0)


def test_entropy_empty_is_zero(spark):
    assert _ent(spark, "") == 0.0


def test_entropy_orders_signals(spark):
    # mash < english-ish < uniform-random-ish alphabet spread
    mash = _ent(spark, "aaaaabaaaaabaaaab")
    english = _ent(spark, "the quick brown fox jumps over the lazy dog")
    assert mash < english


# ---------------------------------------------------------------------------
# Pareto frontier

def test_frontier_drops_dominated(spark):
    df = spark.createDataFrame(
        [("b", 1.0, 10), ("b", 2.0, 5), ("b", 3.0, 20), ("b", 4.0, 20)],
        "g string, x double, y int")
    rows = sorted(
        pareto_frontier_2d(df, "x", "y", ["g"]).collect(),
        key=lambda r: r.x)
    # (2.0, 5) dominated by (1.0, 10); (4.0, 20) dominated by (3.0, 20)
    assert [(r.x, r.y) for r in rows] == [(1.0, 10), (3.0, 20)]


def test_frontier_x_ties_reduce_to_best_y(spark):
    df = spark.createDataFrame(
        [("b", 1.0, 3), ("b", 1.0, 9)], "g string, x double, y int")
    rows = pareto_frontier_2d(df, "x", "y", ["g"]).collect()
    assert [(r.x, r.y) for r in rows] == [(1.0, 9)]


def test_frontier_per_group_independent(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1), ("b", 9.0, 1)], "g string, x double, y int")
    assert pareto_frontier_2d(df, "x", "y", ["g"]).count() == 2


def test_frontier_other_quadrant(spark):
    # maximize x, minimize y: dominated = smaller x AND larger y
    df = spark.createDataFrame(
        [("b", 5.0, 2), ("b", 4.0, 1), ("b", 3.0, 3)],
        "g string, x double, y int")
    rows = sorted(
        pareto_frontier_2d(df, "x", "y", ["g"], minimize_x=False,
                           maximize_y=False).collect(),
        key=lambda r: r.x)
    assert [(r.x, r.y) for r in rows] == [(4.0, 1.0), (5.0, 2.0)]


def test_frontier_matches_naive_quadratic(spark):
    import random

    rng = random.Random(7)
    data = [("g", float(rng.randint(0, 20)), rng.randint(0, 20))
            for _ in range(120)]
    df = spark.createDataFrame(data, "g string, x double, y int")
    fast = {(r.x, r.y) for r in
            pareto_frontier_2d(df, "x", "y", ["g"]).collect()}
    pts = {(x, y) for _, x, y in data}
    naive = {
        (x, y) for x, y in pts
        if not any((x2 <= x and y2 >= y and (x2, y2) != (x, y)
                    and (x2 < x or y2 > y)) for x2, y2 in pts)
    }
    assert fast == naive


# ---------------------------------------------------------------------------
# Min-uniform distinct sketch (streaming-safe counterpart of KMV)

def test_minu_estimate_within_bound(spark):
    from api_to_amt_data_lake_spark.operators.sketches import (
        minu_estimate,
        minu_sketch,
    )

    df = _vals(spark, 2000)
    sk = minu_sketch(df, ["grp"], "v", k_cells=256)
    [r] = minu_estimate(sk, ["grp"], k_cells=256).collect()
    # relative error ~1/sqrt(k) ≈ 6%; allow 4 sigma
    assert abs(r.n_distinct_est - 2000) < 2000 * 0.25


def test_minu_duplicates_do_not_move_estimate(spark):
    from api_to_amt_data_lake_spark.operators.sketches import (
        minu_estimate,
        minu_sketch,
    )

    once = _vals(spark, 500)
    est = lambda d: minu_estimate(  # noqa: E731
        minu_sketch(d, ["grp"], "v", k_cells=128), ["grp"],
        k_cells=128).collect()[0].n_distinct_est
    assert est(once) == est(once.unionAll(once).unionAll(once))


def test_minu_merge_equals_whole(spark):
    from api_to_amt_data_lake_spark.operators.sketches import (
        minu_merge,
        minu_sketch,
    )

    a = _vals(spark, 600)
    b = spark.createDataFrame(
        [("g", i) for i in range(300, 1100)], "grp string, v long")
    whole = minu_sketch(a.unionAll(b), ["grp"], "v", k_cells=64)
    merged = minu_merge(
        minu_sketch(a, ["grp"], "v", k_cells=64)
        .unionAll(minu_sketch(b, ["grp"], "v", k_cells=64)), ["grp"])
    assert ({tuple(r) for r in whole.collect()}
            == {tuple(r) for r in merged.collect()})


def test_minu_small_group_near_exact(spark):
    from api_to_amt_data_lake_spark.operators.sketches import (
        minu_estimate,
        minu_sketch,
    )

    df = _vals(spark, 10)
    sk = minu_sketch(df, ["grp"], "v", k_cells=256)
    [r] = minu_estimate(sk, ["grp"], k_cells=256).collect()
    assert abs(r.n_distinct_est - 10) <= 2


# ---------------------------------------------------------------------------
# Interval union merge / coverage

def _iv(spark, rows):
    return spark.createDataFrame(rows, "k string, s long, e long")


def test_intervals_overlaps_count_once(spark):
    from api_to_amt_data_lake_spark.operators.intervals import (
        interval_coverage,
    )

    df = _iv(spark, [("a", 0, 10), ("a", 5, 15), ("a", 30, 40)])
    [r] = interval_coverage(df, ["k"], "s", "e").collect()
    assert (r.covered, r.n_segments) == (25, 2)


def test_intervals_contained_span_absorbed(spark):
    from api_to_amt_data_lake_spark.operators.intervals import (
        merge_intervals,
    )

    df = _iv(spark, [("a", 0, 100), ("a", 10, 20), ("a", 30, 40)])
    rows = merge_intervals(df, ["k"], "s", "e").collect()
    assert [(r.seg_start, r.seg_end) for r in rows] == [(0, 100)]


def test_intervals_touching_spans_merge(spark):
    from api_to_amt_data_lake_spark.operators.intervals import (
        interval_coverage,
    )

    df = _iv(spark, [("a", 0, 10), ("a", 10, 20)])
    [r] = interval_coverage(df, ["k"], "s", "e").collect()
    assert (r.covered, r.n_segments) == (20, 1)


def test_intervals_duplicate_rows_stable(spark):
    from api_to_amt_data_lake_spark.operators.intervals import (
        interval_coverage,
    )

    df = _iv(spark, [("a", 0, 10), ("a", 0, 10), ("a", 0, 10)])
    [r] = interval_coverage(df, ["k"], "s", "e").collect()
    assert (r.covered, r.n_segments) == (10, 1)


def test_intervals_bridge_span_joins_islands(spark):
    from api_to_amt_data_lake_spark.operators.intervals import (
        interval_coverage,
    )

    # third span arrives sorted between the two it bridges
    df = _iv(spark, [("a", 0, 10), ("a", 20, 30), ("a", 5, 25)])
    [r] = interval_coverage(df, ["k"], "s", "e").collect()
    assert (r.covered, r.n_segments) == (30, 1)


def test_intervals_matches_naive_sweep(spark):
    import random

    from api_to_amt_data_lake_spark.operators.intervals import (
        interval_coverage,
    )

    rng = random.Random(11)
    rows = [("k", s, s + rng.randint(1, 30))
            for s in (rng.randint(0, 200) for _ in range(150))]
    [r] = interval_coverage(_iv(spark, rows), ["k"], "s", "e").collect()
    covered_points = set()
    for _, s, e in rows:
        covered_points.update(range(s, e))
    assert r.covered == len(covered_points)


# ---------------------------------------------------------------------------
# Robust MAD outliers

def test_mad_census_flags_only_planted_outlier(spark):
    from api_to_amt_data_lake_spark.operators.aggregates import (
        robust_outlier_stats,
    )

    vals = [("g", float(v)) for v in [10, 11, 12, 13, 14, 9, 10, 12]]
    vals.append(("g", 10_000.0))
    df = spark.createDataFrame(vals, "grp string, x double")
    [r] = robust_outlier_stats(df, "grp", "x", n_mads=5.0).collect()
    assert r.n_outliers == 1
    # sorted: [9,10,10,11,12,12,13,14,10000] → disc p50 is the 5th (12);
    # the planted outlier shifts it one rank, never to itself
    assert r.median == 12.0
    assert r.mad == 2.0


def test_mad_census_clean_group_has_none(spark):
    from api_to_amt_data_lake_spark.operators.aggregates import (
        robust_outlier_stats,
    )

    df = spark.createDataFrame(
        [("g", float(v)) for v in range(100, 120)], "grp string, x double")
    [r] = robust_outlier_stats(df, "grp", "x").collect()
    assert r.n_outliers == 0


# ---------------------------------------------------------------------------
# CUSUM drift (window algebra == per-row recursion)

def _cusum_rows(spark, vals, k, h):
    from api_to_amt_data_lake_spark.operators.timeseries import cusum_drift

    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate(vals)],
        "grp string, i long, x double")
    rows = cusum_drift(df, ["grp"], [F.col("i")], "x",
                       drift_k=k, threshold_h=h).collect()
    return [ (r.cusum, r.breach) for r in sorted(rows, key=lambda r: r.i)]


def test_cusum_matches_recursive_fold(spark):
    import random

    rng = random.Random(3)
    vals = [rng.uniform(-2, 3) for _ in range(400)]
    k, h = 0.5, 10.0
    got = _cusum_rows(spark, vals, k, h)
    s = 0.0
    for v, (cusum, breach) in zip(vals, got):
        s = max(0.0, s + v - k)
        assert abs(cusum - s) < 1e-9
        assert breach == (cusum > h)


def test_cusum_resets_after_low_run(spark):
    # spike, long quiet stretch, spike: the second spike starts from 0
    vals = [10.0] + [0.0] * 20 + [10.0]
    got = _cusum_rows(spark, vals, 1.0, 5.0)
    assert got[0][0] == 9.0 and got[0][1]
    assert got[-1][0] == 9.0 and got[-1][1]
    assert got[10][0] == 0.0 and not got[10][1]


def test_cusum_in_control_stays_zero(spark):
    got = _cusum_rows(spark, [1.0] * 50, 1.0, 5.0)
    assert all(c == 0.0 and not b for c, b in got)


# ---------------------------------------------------------------------------
# Delta aggregate maintenance (fold(agg(old), cdf) == agg(new))

def _dagg(spark, rows):
    return spark.createDataFrame(rows, "id long, g string, x long")


def _fold_vs_direct(spark, old_rows, new_rows):
    from api_to_amt_data_lake_spark.operators.delta_agg import (
        fold_grouped_sums,
        grouped_sums,
    )
    from api_to_amt_data_lake_spark.sources.incremental import (
        frame_changes,
    )

    old, new = _dagg(spark, old_rows), _dagg(spark, new_rows)
    state = grouped_sums(old, ["g"], ["x"])
    ch = frame_changes(old, new, "id", ["g", "x"], include_old=True)
    folded = {tuple(r) for r in
              fold_grouped_sums(state, ch, ["g"], ["x"]).collect()}
    direct = {tuple(r) for r in
              grouped_sums(new, ["g"], ["x"]).collect()}
    return folded, direct


def test_delta_agg_insert_update_delete_move(spark):
    old = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)]
    new = [(2, "a", 25),          # value update
           (3, "c", 30),          # group move b -> c
           (4, "b", 40),          # unchanged
           (5, "a", 50)]          # insert; id 1 deleted
    folded, direct = _fold_vs_direct(spark, old, new)
    assert folded == direct


def test_delta_agg_group_vanishes(spark):
    old = [(1, "a", 1), (2, "b", 2)]
    new = [(1, "a", 1)]  # group b must disappear, not linger at 0
    folded, direct = _fold_vs_direct(spark, old, new)
    assert folded == direct
    assert all(g != "b" for g, *_ in folded)


def test_delta_agg_from_empty_state(spark):
    from api_to_amt_data_lake_spark.operators.delta_agg import (
        fold_grouped_sums,
        grouped_sums,
    )
    from api_to_amt_data_lake_spark.sources.incremental import (
        frame_changes,
    )

    new = _dagg(spark, [(1, "a", 5), (2, "b", 7)])
    empty = new.filter(F.lit(False))
    ch = frame_changes(empty, new, "id", ["g", "x"], include_old=True)
    folded = {tuple(r) for r in
              fold_grouped_sums(None, ch, ["g"], ["x"]).collect()}
    assert folded == {tuple(r) for r in
                      grouped_sums(new, ["g"], ["x"]).collect()}


def test_delta_agg_randomized(spark):
    import random

    rng = random.Random(13)
    old = [(i, rng.choice("abcd"), rng.randint(0, 99))
           for i in range(300)]
    # new: drop 20%, mutate 30% (value and sometimes group), add 50 new
    new = []
    for i, g, x in old:
        r = rng.random()
        if r < 0.2:
            continue
        if r < 0.5:
            new.append((i, rng.choice("abcd"), x + rng.randint(1, 9)))
        else:
            new.append((i, g, x))
    new += [(1000 + j, rng.choice("abcd"), rng.randint(0, 99))
            for j in range(50)]
    folded, direct = _fold_vs_direct(spark, old, new)
    assert folded == direct


# ---------------------------------------------------------------------------
# Min/max manifest: listing-time file pruning

def _range_dataset(spark, tmp_path):
    from pyspark.sql import functions as F2

    df = spark.range(10_000).select(
        F2.col("id").alias("k"), (F2.col("id") % 97).alias("payload"))
    path = str(tmp_path / "ds")
    # range-partitioned write -> disjoint per-file k ranges
    df.repartitionByRange(8, "k").write.parquet(path)
    return path


def test_manifest_pruned_read_equals_full_filter(spark, tmp_path):
    from api_to_amt_data_lake_spark.sources.manifest import (
        read_pruned,
        write_manifest,
    )

    path = _range_dataset(spark, tmp_path)
    write_manifest(spark, path, ["k"])
    df, kept = read_pruned(spark, path, {"k": (2000, 2999)})
    got = {r.k for r in df.filter((F.col("k") >= 2000)
                                  & (F.col("k") <= 2999)).collect()}
    assert got == set(range(2000, 3000))
    # range-partitioned into 8 files: the 1000-wide band touches few
    assert 0 < len(kept) <= 3


def test_manifest_open_bounds_and_empty_band(spark, tmp_path):
    from api_to_amt_data_lake_spark.sources.manifest import (
        read_pruned,
        write_manifest,
    )

    path = _range_dataset(spark, tmp_path)
    write_manifest(spark, path, ["k"])
    df, kept = read_pruned(spark, path, {"k": (9000, None)})
    assert df.filter(F.col("k") >= 9000).count() == 1000
    empty, kept0 = read_pruned(spark, path, {"k": (50_000, 60_000)})
    assert kept0 == [] and empty.count() == 0
    assert empty.columns == ["k", "payload"]


def test_manifest_refuses_uncovered_files(spark, tmp_path):
    import pytest as _pytest

    from api_to_amt_data_lake_spark.sources.manifest import (
        read_pruned,
        write_manifest,
    )

    path = _range_dataset(spark, tmp_path)
    write_manifest(spark, path, ["k"])
    # a writer that bypassed the manifest
    spark.range(5).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("payload")
    ).coalesce(1).write.mode("append").parquet(path)
    with _pytest.raises(ValueError, match="does not cover"):
        read_pruned(spark, path, {"k": (0, 10)})


# ---------------------------------------------------------------------------
# k-hop BFS

def _bfs(spark, edges, seeds, k):
    from api_to_amt_data_lake_spark.operators.graph import khop_distances

    e = spark.createDataFrame(edges, "s long, t long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    return {r.node: r.dist
            for r in khop_distances(e, s, max_hops=k).collect()}


def test_bfs_chain_distances(spark):
    edges = [(i, i + 1) for i in range(6)]
    assert _bfs(spark, edges, [0], 3) == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_multi_source_takes_min(spark):
    edges = [(0, 1), (1, 2), (2, 3), (5, 3)]
    got = _bfs(spark, edges, [0, 5], 3)
    assert got[3] == 1  # via seed 5, not the 3-hop path from 0


def test_bfs_early_exit_on_exhausted_graph(spark):
    edges = [(0, 1)]
    assert _bfs(spark, edges, [0], 10) == {0: 0, 1: 1}


def test_bfs_cycle_terminates_with_min_dist(spark):
    edges = [(0, 1), (1, 2), (2, 0)]
    assert _bfs(spark, edges, [0], 5) == {0: 0, 1: 1, 2: 2}


def test_bigram_lm_perplexity_analytic(spark):
    """Hand-computed add-k bigram LM scores: reference 'a b a b' gives
    c12={(a,b):2,(b,a):1}, c1={a:2,b:1}, V=2; score 'a b c' under k=0.5:
    P(b|a)=(2+.5)/(2+1)=5/6, P(c|b)=(0+.5)/(1+1)=1/4."""
    import math

    from pyspark.sql import functions as F

    from api_to_amt_data_lake_spark.operators.text import (
        bigram_lm_perplexity,
    )

    df = spark.createDataFrame(
        [(1, "a b a b", "ref"), (2, "a b c", "score"), (3, "z", "score")],
        ["doc_id", "text", "role"])
    got = {r["doc_id"]: (r["n_bigrams"], r["nll"], r["ppl"])
           for r in bigram_lm_perplexity(
               df, "doc_id", "text",
               reference=F.col("role") == "ref").collect()}
    # doc 3 has no bigrams -> absent; docs 1 and 2 scored.
    assert set(got) == {1, 2}
    nll2 = -(math.log(5 / 6) + math.log(1 / 4)) / 2
    assert got[2][0] == 2
    assert abs(got[2][1] - round(nll2, 6)) < 1e-9
    assert abs(got[2][2] - round(math.exp(nll2), 2)) < 1e-9
    # The reference doc scores well under its own model: (a,b) twice,
    # (b,a) once -> all seen bigrams, low nll.
    nll1 = -(2 * math.log(2.5 / 3) + math.log(1.5 / 2)) / 3
    assert got[1][0] == 3
    assert abs(got[1][1] - round(nll1, 6)) < 1e-9
