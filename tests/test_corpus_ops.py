"""Unit tests for operators/corpus.py — hand-computed expectations on
tiny frames, so the conformance oracles (q99zzw–q99zzza) are not the
only evidence the math is right.

Determinism notes the suite exercises deliberately:
- psi_drift bins by integer width from the REFERENCE slice only, and
  clamps out-of-range current values into the top bin.
- bigram_pmi's unigram/bigram probabilities use different denominators
  (total tokens vs total bigrams) — the textbook Church & Hanks form.
- lorenz_concentration's gini uses the integer-sum formula; equal
  counts → gini 0, fully-concentrated → (n-1)/n scaling.
- ngram_type_growth charges a type to the decile of its FIRST doc.
- zipf_fit on an exact power law recovers the exponent.
"""
import math

import pytest

from api_to_amt_data_lake_spark.operators.corpus import (
    bigram_pmi,
    js_divergence,
    ks_drift,
    lorenz_concentration,
    ngram_type_growth,
    psi_drift,
    vocab_richness,
    word_dispersion,
    zipf_fit,
)


def test_psi_drift_identical_slices_zero(spark):
    rows = [(v, False) for v in (5, 15, 25, 35)] + \
           [(v, True) for v in (5, 15, 25, 35)]
    df = spark.createDataFrame(rows, ["v", "is_cur"])
    out = psi_drift(df, "v", "is_cur", bins=4).collect()
    assert len(out) == 4
    assert all(r["psi_term"] == 0.0 for r in out)
    # width = 35 // 4 + 1 = 9 → bins 0,1,2,3 hold one row per slice each
    assert {r["bin"]: (r["n_ref"], r["n_cur"]) for r in out} == {
        0: (1, 1), 1: (1, 1), 2: (1, 1), 3: (1, 1)}


def test_psi_drift_clamps_and_detects_shift(spark):
    # ref max 39 → width 39//4+1 = 10; current value 400 clamps to bin 3.
    rows = [(v, False) for v in (0, 10, 20, 39)] + [(400, True)]
    df = spark.createDataFrame(rows, ["v", "is_cur"])
    out = {r["bin"]: r for r in
           psi_drift(df, "v", "is_cur", bins=4).collect()}
    assert out[3]["n_cur"] == 1 and out[3]["n_ref"] == 1
    # PSI terms are (p-q)·ln(p/q) ⇒ each is ≥ 0 (same-sign factors);
    # the shifted-into bin carries the largest contribution.
    assert all(out[b]["psi_term"] > 0 for b in range(4))
    assert out[3]["psi_term"] == max(r["psi_term"] for r in out.values())
    # smoothed terms are finite even for the empty-current bins
    assert all(math.isfinite(out[b]["psi_term"]) for b in out)


def test_bigram_pmi_textbook_value(spark):
    # "a b" ×5 docs: unigrams a=5, b=5, N_tok=10; bigram (a,b)=5, N_bi=5.
    # pmi = ln( (5/5) / ((5/10)*(5/10)) ) = ln 4.
    df = spark.createDataFrame([("a b",)] * 5, ["text"])
    out = bigram_pmi(df, "text", min_count=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["w1"], r["w2"], r["n_xy"]) == ("a", "b", 5)
    assert r["pmi"] == pytest.approx(math.log(4.0), abs=1e-6)


def test_bigram_pmi_min_count_filters(spark):
    df = spark.createDataFrame([("a b",)] * 5 + [("c d",)], ["text"])
    got = {(r["w1"], r["w2"]) for r in
           bigram_pmi(df, "text", min_count=5).collect()}
    assert got == {("a", "b")}  # (c,d) count 1 < 5 dropped pre-join


def test_lorenz_gini_extremes(spark):
    # equal counts → gini 0; shares/cum_shares form the diagonal.
    eq = spark.createDataFrame(
        [("s1",), ("s2",), ("s3",), ("s4",)], ["k"])
    out = lorenz_concentration(eq, "k").collect()
    assert all(r["gini"] == 0.0 for r in out)
    assert all(r["hhi"] == 0.25 for r in out)
    assert sorted(r["cum_share"] for r in out) == [0.25, 0.5, 0.75, 1.0]

    # 1,1,1,97 of 100 → hand-computed integer-form gini
    rows = [("a",)] + [("b",)] + [("c",)] + [("d",)] * 97
    sk = spark.createDataFrame(rows, ["k"])
    out = lorenz_concentration(sk, "k").collect()
    n, t = 4, 100
    s = 1 * 1 + 2 * 1 + 3 * 1 + 4 * 97
    want = round((2.0 * s) / (n * t) - (n + 1.0) / n, 6)
    assert all(r["gini"] == want for r in out)
    hhi = round((1 + 1 + 1 + 97 * 97) / (t * t), 6)
    assert all(r["hhi"] == hhi for r in out)
    # ascending rank: the dominant source ranks last
    top = max(out, key=lambda r: r["rank"])
    assert top["k"] == "d" and top["share"] == 0.97


def test_ngram_type_growth_first_appearance(spark):
    # 10 docs; bigram (a,b) first in doc 0, (c,d) first in doc 5,
    # (a,b) repeats in doc 9 — charged to decile 0 only.
    rows = [(0, "a b"), (5, "c d"), (9, "a b")] + \
           [(i, "x") for i in (1, 2, 3, 4, 6, 7, 8)]  # 1-token: no bigram
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["bucket"]: r for r in
           ngram_type_growth(df, "doc_id", "text", buckets=10).collect()}
    assert len(out) == 10  # spine materializes empty deciles
    assert out[0]["new_types"] == 1 and out[5]["new_types"] == 1
    assert out[9]["new_types"] == 0  # repeat is not a new type
    assert out[9]["cum_types"] == 2
    assert [out[b]["cum_types"] for b in range(10)] == \
        [1, 1, 1, 1, 1, 2, 2, 2, 2, 2]


def test_zipf_fit_recovers_exponent(spark):
    # counts c(r) = round(1000 / r): slope ≈ -1 on the exact law.
    docs = []
    for rank in range(1, 21):
        c = round(1000 / rank)
        docs.extend([(f"w{rank:02d}",)] * c)
    df = spark.createDataFrame(docs, ["text"])
    out = zipf_fit(df, "text", top_n=1000).collect()[0]
    assert out["n_types"] == 20
    assert out["slope"] == pytest.approx(-1.0, abs=0.01)
    assert out["r2"] > 0.999


def test_zipf_fit_top_n_truncates(spark):
    df = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 2 + [("c",)], ["text"])
    out = zipf_fit(df, "text", top_n=2).collect()[0]
    assert out["n_types"] == 2


def test_word_dispersion_extremes(spark):
    # Two equal-size parts (5 tokens each). "even" appears 2+2 ⇒ its
    # shares match the part shares exactly ⇒ DP 0. "burst" appears 5×
    # only in part a ⇒ v=(1,0) vs s=(0.5,0.5) ⇒ DP 0.5.
    rows = [("a", "even even burst burst burst"),
            ("b", "even even x y z")]
    df = spark.createDataFrame(rows, ["source", "text"])
    got = {r["w"]: r for r in
           word_dispersion(df, "source", "text", min_count=3).collect()}
    assert set(got) == {"even", "burst"}  # x/y/z below min_count
    assert got["even"]["dp"] == 0.0 and got["even"]["c_w"] == 4
    assert got["burst"]["dp"] == 0.5 and got["burst"]["c_w"] == 3


def test_word_dispersion_absent_part_telescopes(spark):
    # Three parts; the word misses part c entirely — the absent-part
    # term C_w·T_c must be counted without a word×part spine.
    # Parts: a=4, b=4, c=2 tokens (T=10); w: 2 in a, 2 in b, 0 in c.
    # v=(0.5,0.5,0), s=(0.4,0.4,0.2) ⇒ DP=0.5*(0.1+0.1+0.2)=0.2.
    rows = [("a", "w w p q"), ("b", "w w r s"), ("c", "t u")]
    df = spark.createDataFrame(rows, ["source", "text"])
    got = {r["w"]: r["dp"] for r in
           word_dispersion(df, "source", "text", min_count=4).collect()}
    assert got == {"w": 0.2}


def test_ks_drift_identical_and_disjoint(spark):
    # identical value sets on both sides -> D = 0
    same = [(v, False) for v in (1, 2, 3)] + [(v, True) for v in (1, 2, 3)]
    df = spark.createDataFrame([("g", v, c) for v, c in same],
                               ["g", "v", "is_cur"])
    [r] = ks_drift(df, ["g"], "v", "is_cur").collect()
    assert (r["ks_d"], r["n_ref"], r["n_cur"]) == (0.0, 3, 3)

    # fully separated: ref in {1,2}, cur in {10,20} -> D = 1 at x=2
    sep = [(1, False), (2, False), (10, True), (20, True)]
    df = spark.createDataFrame([("g", v, c) for v, c in sep],
                               ["g", "v", "is_cur"])
    [r] = ks_drift(df, ["g"], "v", "is_cur").collect()
    assert r["ks_d"] == 1.0 and r["ks_x"] == 2


def test_ks_drift_known_value_and_empty_slice_excluded(spark):
    # ref {1,2,3,4}, cur {3,4,5,6}: D = |F_cur - F_ref| peaks at x=2
    # (ref 0.5 vs cur 0) -> D = 0.5. Group h has no current rows ->
    # excluded.
    rows = [("g", v, False) for v in (1, 2, 3, 4)] + \
           [("g", v, True) for v in (3, 4, 5, 6)] + \
           [("h", 1, False)]
    df = spark.createDataFrame(rows, ["g", "v", "is_cur"])
    out = {r["g"]: r for r in ks_drift(df, ["g"], "v", "is_cur").collect()}
    assert set(out) == {"g"}
    assert out["g"]["ks_d"] == 0.5 and out["g"]["ks_x"] == 2


def test_js_divergence_identical_zero_disjoint_ln2(spark):
    # identical distributions -> JSD 0; disjoint supports -> ln 2.
    same = [("g", i, c) for i in ("a", "b") for c in (False, True)]
    df = spark.createDataFrame(same, ["g", "item", "is_cur"])
    [r] = js_divergence(df, ["g"], "item", "is_cur").collect()
    assert (r["jsd"], r["n_ref"], r["n_cur"]) == (0.0, 2, 2)

    disj = [("g", "a", False), ("g", "b", True)]
    df = spark.createDataFrame(disj, ["g", "item", "is_cur"])
    [r] = js_divergence(df, ["g"], "item", "is_cur").collect()
    assert abs(r["jsd"] - math.log(2)) < 1e-6


def test_js_divergence_known_value_and_empty_slice_excluded(spark):
    # ref: a,a,b; cur: a,b,b,c — compare to the direct formula.
    rows = [("g", w, False) for w in "aab"] + \
           [("g", w, True) for w in "abbc"] + \
           [("h", "x", False)]
    df = spark.createDataFrame(rows, ["g", "item", "is_cur"])
    out = {r["g"]: r for r in
           js_divergence(df, ["g"], "item", "is_cur").collect()}
    assert set(out) == {"g"}  # h has no current slice -> excluded
    p = {"a": 1 / 4, "b": 2 / 4, "c": 1 / 4}
    q = {"a": 2 / 3, "b": 1 / 3, "c": 0.0}
    exp = 0.0
    for w in "abc":
        m = (p[w] + q[w]) / 2
        if p[w]:
            exp += 0.5 * p[w] * math.log(p[w] / m)
        if q[w]:
            exp += 0.5 * q[w] * math.log(q[w] / m)
    assert abs(out["g"]["jsd"] - exp) < 1e-6
    assert (out["g"]["n_ref"], out["g"]["n_cur"]) == (3, 4)


def test_vocab_richness_spectrum_and_chao1(spark):
    # "a a b c": N=4, V=3, f1=2 (b,c), f2=1 (a)
    #   chao1 = 3 + 2*1/(2*2) = 3.5; coverage = 1 - 2/4 = 0.5
    # "a b": f2=0 exercises the bias-corrected denominator (f2+1).
    # "a a a": f1=0 -> chao1 = V, coverage = 1.
    rows = [("s1", "a a b c"), ("s2", "a b"), ("s3", "a a a")]
    df = spark.createDataFrame(rows, ["source", "text"])
    out = {r["source"]: r for r in
           vocab_richness(df, ["source"], "text").collect()}
    assert (out["s1"]["n_tokens"], out["s1"]["v_types"],
            out["s1"]["f1"], out["s1"]["f2"]) == (4, 3, 2, 1)
    assert out["s1"]["chao1"] == 3.5 and out["s1"]["coverage"] == 0.5
    assert out["s2"]["chao1"] == 3.0 and out["s2"]["coverage"] == 0.0
    assert out["s3"]["chao1"] == 1.0 and out["s3"]["coverage"] == 1.0


def test_zipf_topn_cut_is_take_ordered_not_global_sort(spark):
    """The top-N vocabulary cut must plan as TakeOrderedAndProject
    (per-partition top-k, driver merges k·partitions rows) — never a
    global Sort of the vocabulary; rank assignment happens after the
    bound, on ≤ top_n rows, via the packed-array helper (the
    no-partitionless-WindowExec audit covers the registered query)."""
    df = spark.createDataFrame([("a b c",)] * 3, ["text"])
    plan = (zipf_fit(df, "text", top_n=10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
    assert "WindowExec" not in plan
