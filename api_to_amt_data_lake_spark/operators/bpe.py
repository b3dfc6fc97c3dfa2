"""Distributed BPE (byte-pair-encoding) merge training.

The tokenizer-training half of a training-data pipeline: learn the
merge table from the corpus (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units"). `operators/text.py`
already counts tokens with a FIXED BPE-ish regex; this module LEARNS
the merges.

Algorithm (the standard loop, distributed):
  1. one corpus pass: word -> count (whitespace words, groupBy),
  2. each word's symbol sequence starts as its characters, stored as a
     space-joined, space-sentineled string (" h e l l o "),
  3. per round: count adjacent symbol pairs weighted by word count
     (split -> zip_with -> explode -> partial-aggregated groupBy),
     pick the most frequent pair (count desc, then lexicographic —
     deterministic), and rewrite every sequence with a three-step
     string replace (see below).

A naive `replace(" a b ", " ab ")` on a single-space-sentineled
sequence is NOT greedy BPE: each match consumes the trailing space
that the next candidate match needs as its leading space, so
repeated-symbol runs under-merge (" a a a a " -> " aa a a ", not
" aa aa "). Sennrich's reference implementation avoids this with
non-consuming regex lookarounds — unavailable in DuckDB's RE2. The
portable exact equivalent used here: DOUBLE every sentinel space so
each inter-symbol gap owns two spaces, match the pair pattern
" a  b " (consuming one space from each side of the gap, leaving the
neighbor's boundary intact), replace with " ab " (restoring the
two-space invariant), then collapse "  " -> " ":

    replace(replace(replace(seq, ' ', '  '), ' a  b ', ' ab '),
            '  ', ' ')

This is exact greedy left-to-right pairwise merging ("a a a a a" ->
"aa aa a", matching Sennrich), uses only plain `replace`, and is
identical in Spark and DuckDB/ANSI SQL — which is what makes the
trained merge table ORACLE-VERIFIABLE (conformance q99u unrolls the
rounds in SQL with the same three-step rewrite).

Scale shape: the model (merge list) lives on the driver — one row per
round crosses to it, like the k-means loop's counters. Everything
heavy is executor-side: the word-count pass shuffles once on the word;
each round is one partial-aggregated pair count over the (deduplicated)
word table — cost is O(distinct words × word length) per round, NOT
O(corpus), because the frequency weighting collapsed the corpus in
step 1. The per-round rewrite is a scan-level string replace. At
100 TB the word table for natural-language text is millions of rows —
broadcast-sized next to the corpus that produced it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _merge_pair(seq: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of pair (a, b) in a space-sentineled
    symbol sequence. Three plain replaces: double the sentinels so
    adjacent matches don't consume each other's shared boundary space,
    rewrite the pair, collapse back to canonical single-space form.
    Exactly Sennrich's lookaround-regex semantics, without lookarounds
    (portable to DuckDB/RE2 for the oracle)."""
    doubled = F.replace(seq, F.lit(" "), F.lit("  "))
    merged = F.replace(doubled, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    return F.replace(merged, F.lit("  "), F.lit(" "))


def word_counts(corpus: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt): whitespace tokenization + one groupBy — the single
    corpus-sized pass of BPE training."""
    return (
        corpus.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
            .alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_sequences(words: DataFrame) -> DataFrame:
    """Add the space-sentineled character sequence column."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substr(F.col("word"), i, F.lit(1)))
    return words.withColumn(
        "seq", F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" ")))


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """(a, b, pair_count): adjacent symbol pairs weighted by word count,
    partial-aggregated map-side."""
    toks = F.split(F.trim(F.col("seq")), " ")
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    return (
        seqs.select(F.col("cnt"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("pair_count"))
    )


def bpe_train(corpus: DataFrame, text_col: str,
              n_merges: int = 8,
              checkpoint_dir: str | None = None,
              pin_interval: int = 8) -> DataFrame:
    """Learn `n_merges` BPE merge rules from the corpus. Returns one row
    per learned rule: (round, left, right, pair_count), round 1-based in
    learning order — the merge table a tokenizer ships. Stops early if
    no pair remains (all words fully merged).

    Lineage (VERDICT r8 item 5): the collapsed word table is
    re-materialized every merge round — `checkpoint_dir` selects
    reliable `checkpoint()` files (use on a real cluster: survives
    executor loss, an unconditional localCheckpoint would fail the
    query there); the default `localCheckpoint()` pins blocks to
    executors and is only safe single-node — the same option surface as
    `connected_components` / `pagerank`. The context checkpoint dir is
    set only for the duration of the call (every checkpoint here is
    eager) and the previous value restored — ADVICE r9.

    Round-11 job shape (guide §1.2 "fewer passes"): the per-round
    rewrite is NOT materialized — each learned merge is a three-replace
    string expression, and the pending merges since the last pin ride
    as a chained expression on top of the pinned word table, so a round
    costs exactly ONE job (the pair-count collect) instead of two
    (count + eager re-pin). Chained replaces run at scan speed; a
    re-pin every `pin_interval` rounds bounds the expression depth
    (3×`pin_interval` replaces) and the re-applied-work window, which
    keeps the plan codegen-friendly at merge counts in the thousands.
    The counted sequences are identical expressions of the same merges,
    so the chosen pairs — and the returned merge table — are unchanged.
    """
    from api_to_amt_data_lake_spark.operators.checkpoints import (
        scoped_checkpoint_dir,
    )

    spark = corpus.sparkSession

    def _pin(df: DataFrame) -> DataFrame:
        return (df.checkpoint() if checkpoint_dir is not None
                else df.localCheckpoint())

    with scoped_checkpoint_dir(spark, checkpoint_dir):
        base = _initial_sequences(word_counts(corpus, text_col))
        # The word table is re-read every round; pin it once (it is the
        # collapsed corpus — small next to its source).
        base = _pin(base)
        pending: list[tuple[str, str]] = []  # merges since last pin

        def _seqs() -> DataFrame:
            seq = F.col("seq")
            for a, b in pending:
                seq = _merge_pair(seq, a, b)
            return base.withColumn("seq", seq) if pending else base

        merges: list[tuple[int, str, str, int]] = []
        for rnd in range(1, n_merges + 1):
            best = (
                _pair_counts(_seqs())
                .orderBy(F.col("pair_count").desc(), F.col("a").asc(),
                         F.col("b").asc())
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b, cnt = (best[0]["a"], best[0]["b"],
                         int(best[0]["pair_count"]))
            merges.append((rnd, a, b, cnt))
            pending.append((a, b))
            if len(pending) >= pin_interval:
                base = _pin(_seqs())
                pending = []
    return spark.createDataFrame(
        merges, "round int, left string, right string, pair_count bigint")


def bpe_segment(df: DataFrame, text_col: str,
                merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge table: adds `bpe_tokens` (per-row token
    count after all merges) — the measurement that makes tokenizer
    compression visible. Pure scan-level string expressions, one pass,
    no shuffle."""
    chars_of = lambda w: F.transform(  # noqa: E731
        F.sequence(F.lit(1), F.length(w)),
        lambda i: F.substr(w, i, F.lit(1)))
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    seq_of = lambda w: F.concat(  # noqa: E731
        F.lit(" "), F.array_join(chars_of(w), " "), F.lit(" "))

    def merged(seq):
        for a, b in merges:
            seq = _merge_pair(seq, a, b)
        return seq

    tok_count = F.aggregate(
        words, F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.when(
            F.length(w) == 0, F.lit(0)
        ).otherwise(F.size(F.split(F.trim(merged(seq_of(w))), " "))))
    return df.withColumn("bpe_tokens", tok_count)
