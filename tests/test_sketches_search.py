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
