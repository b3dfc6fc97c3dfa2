"""Document chunking and corpus-split operators for training pipelines.

A pretraining pipeline rarely feeds whole documents to the trainer: long
documents are cut into fixed-token-budget chunks (with overlap so no
span is seen only at a boundary), and the corpus is partitioned into
train/val/test splits that must be deterministic across reruns and
machines (never `rand()` — a re-shard would migrate documents between
splits and contaminate evaluation).

All ops here are pure Column expressions (JVM-side, codegen'd):
- `chunk_spans` explodes one row per chunk via sequence+explode+slice —
  embarrassingly parallel per row, zero shuffle; at 100 TB it runs at
  scan speed and the output is written partition-local.
- `split_assign` buckets on the first hex nibble of md5(key), so the
  assignment is a pure function of content — stable under resharding,
  reruns, and engine choice (md5 is bit-identical everywhere).

Reference parity: the reference pipeline has no trainer-facing chunker
(it materializes whole gold rows); these extend the engine for the
LLM-data workload the brief adds on top of reference semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators.text import tokens


def chunk_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 64,
    stride: int = 32,
) -> DataFrame:
    """One output row per sliding-window chunk of `text_col`.

    Chunks start at 0, stride, 2*stride, ... ; the last window starts at
    the smallest multiple of `stride` whose window reaches the end, so
    every token is covered and interior tokens appear in
    ceil(chunk/stride) windows. Returns (id, chunk_idx, n_tokens,
    chunk_md5) — the md5 stands in for the chunk text so the verified
    payload stays compact while still pinning the exact bytes.

    Scale: no shuffle — sequence/explode/slice are per-row narrow ops.
    Output size is input_tokens/stride rows; the explode happens after
    any pushed filters, so a filtered corpus chunks only what survives.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride))
    ).cast("int")
    out = (
        df.select(
            F.col(id_col),
            toks.alias("_toks"),
            n.alias("_n"),
            F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.least(
                F.lit(chunk_tokens),
                F.col("_n") - F.col("chunk_idx") * F.lit(stride),
            ).cast("long").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.slice(
                        F.col("_toks"),
                        F.col("chunk_idx") * F.lit(stride) + F.lit(1),
                        F.lit(chunk_tokens),
                    ),
                    " ",
                )
            ).alias("chunk_md5"),
        )
    )
    return out


# First-nibble buckets of md5: 16 equiprobable buckets; 12/2/2 gives the
# conventional 75/12.5/12.5 split. Content-keyed, so adding or removing
# other documents never moves an existing document across splits.
_TRAIN = tuple("0123456789ab")
_VAL = ("c", "d")


def split_assign(key: Column | str) -> Column:
    """Deterministic train/val/test label from md5(key) first nibble."""
    col = F.col(key) if isinstance(key, str) else key
    nib = F.substring(F.md5(col), 1, 1)
    return (
        F.when(nib.isin(*_TRAIN), F.lit("train"))
        .when(nib.isin(*_VAL), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def unigram_surprisal(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Per-document mean unigram surprisal (-ln p(token)) under the
    corpus's own empirical unigram distribution — the classic cheap
    perplexity proxy for quality filtering (high surprisal = rare-token
    soup: boilerplate, lists, OCR noise; low = repetitive filler).

    Determinism: each token's ln() term is rounded to 9dp and summed in
    DECIMAL(38,12), so the fold is exact and order-insensitive — the
    same trick the cosine ops use to stay bit-identical with the oracle.

    Scale: one token-level shuffle to build the vocab (heavily combined
    map-side: distinct tokens per partition, not occurrences), the vocab
    joins back by token hash (uniform key, or broadcast when the vocab
    fits — a 1M-type vocab is ~tens of MB), and one doc-level shuffle
    for the per-document mean. No Python, no driver state.
    """
    toks = (
        df.select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("tok_n"))
    total = vocab.agg(F.sum("tok_n").alias("corpus_n"))
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.round(
                -F.log(F.col("tok_n").cast("double") / F.col("corpus_n")), 9
            ).cast("decimal(38,12)").alias("term"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(
                F.sum("term").cast("double") / F.count("*"), 6
            ).alias("avg_surprisal"),
        )
    )
    return scored
