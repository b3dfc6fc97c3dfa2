"""Chunking / split / surprisal operators (operators/chunking.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators.chunking import (
    chunk_spans,
    split_assign,
    unigram_surprisal,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_spans_counts_and_coverage(spark):
    # 10 tokens, chunk=4, stride=2 -> starts 0,2,4,6 -> 4 chunks
    text = " ".join(f"t{i}" for i in range(10))
    out = chunk_spans(
        _docs(spark, [(1, text)]), "text", "doc_id", chunk_tokens=4, stride=2
    ).collect()
    assert [r.chunk_idx for r in out] == [0, 1, 2, 3]
    # all full windows except the math guarantees last start+chunk >= n
    assert [r.n_tokens for r in out] == [4, 4, 4, 4]


def test_chunk_spans_short_doc_single_chunk(spark):
    out = chunk_spans(
        _docs(spark, [(1, "a b"), (2, "x")]), "text", "doc_id",
        chunk_tokens=4, stride=2,
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(out) == 2
    assert by_id[1].n_tokens == 2 and by_id[1].chunk_idx == 0
    assert by_id[2].n_tokens == 1


def test_chunk_spans_tail_partial_window(spark):
    # 7 tokens, chunk=4, stride=4 -> starts 0,4 -> lengths 4,3
    text = " ".join(f"t{i}" for i in range(7))
    out = chunk_spans(
        _docs(spark, [(1, text)]), "text", "doc_id", chunk_tokens=4, stride=4
    ).orderBy("chunk_idx").collect()
    assert [r.n_tokens for r in out] == [4, 3]
    # every token covered exactly once at stride == chunk
    assert sum(r.n_tokens for r in out) == 7


def test_split_assign_deterministic_and_total(spark):
    df = _docs(spark, [(i, f"document number {i}") for i in range(200)])
    a = df.select("doc_id", split_assign("text").alias("s")).collect()
    b = df.select("doc_id", split_assign("text").alias("s")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    splits = {r.s for r in a}
    assert splits <= {"train", "val", "test"}
    # 12/16 expectation: train strictly dominates on 200 docs
    n_train = sum(1 for r in a if r.s == "train")
    assert n_train > 100


def test_split_assign_content_keyed_stability(spark):
    # adding unrelated rows must not move an existing doc's split
    base = _docs(spark, [(1, "alpha beta gamma")])
    more = _docs(spark, [(1, "alpha beta gamma"), (2, "other"), (3, "rows")])
    s1 = base.select(split_assign("text").alias("s")).collect()[0].s
    s2 = (
        more.where(F.col("doc_id") == 1)
        .select(split_assign("text").alias("s")).collect()[0].s
    )
    assert s1 == s2


def test_unigram_surprisal_hand_computed(spark):
    # corpus: doc1 = "a a b", doc2 = "b" -> counts a:2 b:2 total 4
    # p(a)=p(b)=0.5 -> every token term = ln 2; both docs avg = ln 2
    df = _docs(spark, [(1, "a a b"), (2, "b")])
    out = {r.doc_id: r for r in unigram_surprisal(df, "text", "doc_id").collect()}
    assert out[1].n_tokens == 3 and out[2].n_tokens == 1
    assert abs(out[1].avg_surprisal - math.log(2)) < 1e-6
    assert abs(out[2].avg_surprisal - math.log(2)) < 1e-6


def test_unigram_surprisal_rare_tokens_score_higher(spark):
    common = " ".join(["the"] * 50)
    rare = "zyxwv qqqqq jjjjj"
    df = _docs(spark, [(1, common), (2, rare)])
    out = {r.doc_id: r for r in unigram_surprisal(df, "text", "doc_id").collect()}
    assert out[2].avg_surprisal > out[1].avg_surprisal


def test_weighted_sample_biases_toward_heavy_weights(spark):
    from api_to_amt_data_lake_spark.operators.sampling import weighted_sample_keys
    # 100 light docs (w=1) + 10 heavy docs (w=1000): a top-10 draw should
    # be dominated by heavy docs across any seed
    rows = [(i, 1) for i in range(100)] + [(1000 + i, 1000) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    hits = 0
    for seed in (1, 2, 3):
        keyed = weighted_sample_keys(df, "doc_id", "w", seed=seed)
        top = keyed.orderBy(F.desc("_wkey"), F.asc("doc_id")).limit(10).collect()
        hits += sum(1 for r in top if r.doc_id >= 1000)
    assert hits >= 24  # >= 80% heavy across 30 draws


def test_weighted_sample_deterministic_across_partitionings(spark):
    from api_to_amt_data_lake_spark.operators.sampling import weighted_sample_keys
    df = spark.createDataFrame(
        [(i, i % 7 + 1) for i in range(200)], "doc_id long, w long")
    a = weighted_sample_keys(df, "doc_id", "w", seed=5)
    b = weighted_sample_keys(df.repartition(13), "doc_id", "w", seed=5)
    ta = [r.doc_id for r in a.orderBy(F.desc("_wkey"), "doc_id").limit(20).collect()]
    tb = [r.doc_id for r in b.orderBy(F.desc("_wkey"), "doc_id").limit(20).collect()]
    assert ta == tb
