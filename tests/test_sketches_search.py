"""Count-min sketch (operators/sketches.py) and BM25 (operators/search.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators.search import bm25_scores
from api_to_amt_data_lake_spark.operators.sketches import cms_build, cms_estimate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cms_never_underestimates(spark):
    df = _docs(spark, [(i, "alpha beta beta gamma " * (i + 1)) for i in range(5)])
    sketch = cms_build(df, "text", depth=4, hex_chars=2)
    toks = df.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), " ")).alias("tok")
    ).where(F.col("tok") != "")
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(sketch, exact, depth=4, hex_chars=2)
    rows = exact.join(est, "tok").collect()
    assert rows and all(r.est >= r.exact for r in rows)


def test_cms_state_bounded(spark):
    # 26^3 distinct tokens but the sketch never exceeds d * 16^hex cells
    text = " ".join(f"w{i}" for i in range(5000))
    sketch = cms_build(_docs(spark, [(1, text)]), "text", depth=4, hex_chars=2)
    assert sketch.count() <= 4 * 256


def test_cms_shard_merge_equals_whole(spark):
    a = _docs(spark, [(1, "x y z x"), (2, "y y q")])
    b = _docs(spark, [(3, "z q q x")])
    whole = cms_build(a.unionAll(b), "text", depth=2, hex_chars=2)
    merged = (
        cms_build(a, "text", depth=2, hex_chars=2)
        .unionAll(cms_build(b, "text", depth=2, hex_chars=2))
        .groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_bm25_matching_doc_outranks_and_nonmatching_absent(spark):
    df = _docs(spark, [
        (1, "spark shuffle join merge merge"),
        (2, "spark shuffle join"),
        (3, "totally unrelated words here"),
    ])
    out = {r.doc_id: r.bm25 for r in
           bm25_scores(df, "text", "doc_id", ["merge"]).collect()}
    assert set(out) == {1}  # only doc 1 contains 'merge'
    assert out[1] > 0


def test_bm25_tf_saturation_and_length_norm(spark):
    # same tf, longer doc scores lower (length normalization, b>0)
    df = _docs(spark, [
        (1, "merge " + "pad " * 5),
        (2, "merge " + "pad " * 50),
    ])
    out = {r.doc_id: r.bm25 for r in
           bm25_scores(df, "text", "doc_id", ["merge"]).collect()}
    assert out[1] > out[2]


def test_gopher_flags_rule_battery(spark):
    from api_to_amt_data_lake_spark.operators.text import gopher_flags
    df = _docs(spark, [
        (1, "the quick brown fox jumps with grace and poise " * 10),  # pass
        (2, "short text"),                                # fails min_words
        (3, ("### " * 40) + "the end with that"),         # fails symbols/alpha
        (4, " ".join(["zz"] * 60)),                       # fails stopwords+len
    ])
    flags = gopher_flags("text", min_words=30, min_stopwords=2)
    out = {r.doc_id: r for r in df.select(
        "doc_id", *[v.alias(k) for k, v in flags.items()]).collect()}
    assert out[1].ok_all
    assert not out[2].ok_words and not out[2].ok_all
    assert not out[3].ok_symbols and not out[3].ok_all
    assert not out[4].ok_stopwords and not out[4].ok_mean_len


def test_binary_quantize_and_hamming_match_numpy(spark):
    import numpy as np

    from api_to_amt_data_lake_spark.operators.similarity import (
        binary_quantize,
        hamming_topk,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 64)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>")
    bits = binary_quantize(df, "vec_id", "embedding", dims=64)
    got = {r["vec_id"]: r["bits"] for r in bits.collect()}

    def pack(v):
        words = []
        for w in range(2):
            acc = 0
            for j in range(32):
                if v[w * 32 + j] > 0:
                    acc |= 1 << j
            words.append(acc)
        return words

    for i in range(20):
        assert got[i] == pack(vecs[i]), i

    top = hamming_topk(bits.filter("vec_id < 2"), bits, "vec_id", k=3)
    rows = [(r["query_id"], r["match_id"], r["hamming"])
            for r in top.collect()]
    packed = {i: pack(vecs[i]) for i in range(20)}
    for q, m, h in rows:
        expect = sum(bin(a ^ b).count("1")
                     for a, b in zip(packed[q], packed[m]))
        assert h == expect, (q, m)
    # every reported neighbor is within the true top-3 hamming radius
    for q in (0, 1):
        dists = sorted(
            sum(bin(a ^ b).count("1")
                for a, b in zip(packed[q], packed[m]))
            for m in range(20) if m != q)
        reported = sorted(h for qq, m, h in rows if qq == q)
        assert reported == dists[:3], q


def test_dsir_logweights_prefers_target_like_docs(spark):
    from api_to_amt_data_lake_spark.operators.sampling import (
        dsir_logweights,
    )

    # target speaks "alpha beta"; raw mixes alpha-docs and noise docs
    raw = spark.createDataFrame(
        [(1, "alpha beta alpha beta"), (2, "alpha beta gamma"),
         (3, "zork quux fnord blarg"), (4, "zork zork quux")],
        "doc_id long, text string")
    target = spark.createDataFrame(
        [(100, "alpha beta alpha"), (101, "beta alpha beta")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["dsir_logw"])
           for r in dsir_logweights(raw, target, "text", "doc_id")
           .collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1][0] == 4
    # target-like docs outrank noise docs, per-token
    per_tok = {k: v[1] / v[0] for k, v in got.items()}
    assert per_tok[1] > per_tok[3] and per_tok[2] > per_tok[4]
    assert got[1][1] > 0 > got[3][1]


def test_hll_rollup_merged_equals_direct(spark):
    """HLL union is exact at the register level: day estimates from
    merged hourly sketches == estimates from sketching the day's raw
    rows directly, and both are near-exact at small cardinalities."""
    from datetime import datetime, timedelta

    from api_to_amt_data_lake_spark.operators.sketches import (
        hll_hourly_sketches,
        hll_rollup_estimates,
    )
    from pyspark.sql import functions as F

    t0 = datetime(2024, 5, 1, 0, 30)
    rows = []
    for h in range(48):                    # two days of hourly traffic
        for u in range(1 + h % 7):
            rows.append((t0 + timedelta(hours=h), "click",
                         (h * 13 + u) % 40))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, "
                                     "user_id long")
    hourly = hll_hourly_sketches(df, "ts", ["event_type"], "user_id")
    merged = {(r["bucket_start"], r["event_type"]): r["n_distinct"]
              for r in hll_rollup_estimates(
                  hourly, "day", ["event_type"]).collect()}
    direct = {(r["b"], r["event_type"]): r["nd"] for r in (
        df.groupBy(F.date_trunc("day", "ts").alias("b"), "event_type")
        .agg(F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id"), F.lit(12))).alias("nd"))
        .collect())}
    assert merged == direct and len(merged) == 2
    exact = {(r["b"], r["event_type"]): r["nd"] for r in (
        df.groupBy(F.date_trunc("day", "ts").alias("b"), "event_type")
        .agg(F.countDistinct("user_id").alias("nd")).collect())}
    for k in exact:
        assert abs(merged[k] - exact[k]) <= max(1, 0.05 * exact[k])
