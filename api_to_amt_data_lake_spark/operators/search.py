"""Lexical ranked retrieval (BM25) over a document corpus.

Complements the vector side (`operators/similarity.py`) with the
term-based ranking a data-curation stack uses for targeted corpus
probes ("find the docs about X to audit/remove/upsample"). Pure
relational plan, ONE corpus pass:

- tokenize+explode feeds a single groupBy(id) that computes the document
  length AND every query term's tf as conditional aggregates — the
  per-(doc, term) shuffle of a classic two-branch BM25 plan disappears,
  and the map-side combine means the one shuffle carries one row per
  (partition, doc);
- corpus stats (N, total length) and per-term document frequencies all
  come from ONE single-row aggregate over that per-doc frame, broadcast
  back; Catalyst's ReuseExchange dedups the per-doc shuffle, so the
  corpus is scanned exactly once (plan-audited);
- |query| is small and known, so per-term columns are a fixed-width
  projection, never a fan-out.

Determinism: each term's BM25 contribution is rounded to 9dp and summed
in DECIMAL(38,12) (exact, order-fixed row-level fold), the same
contract the cosine/surprisal ops use, so results hash-match the SQL
oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators.text import tokens


def bm25_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, bm25) for every document matching ≥1 query term, using the
    Robertson idf with the +1 floor (ln(1 + (N-df+0.5)/(df+0.5))) so
    scores stay positive even for terms in most documents."""
    terms = sorted({t.lower() for t in query_terms})
    toks = (
        df.select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[F.count(F.when(F.col("tok") == t, 1)).alias(f"_tf{i}")
          for i, t in enumerate(terms)],
    )
    stats = per_doc.agg(
        F.sum("dl").alias("sum_dl"),
        F.count(F.lit(1)).alias("n_docs"),
        *[F.count(F.when(F.col(f"_tf{i}") > 0, 1)).alias(f"_df{i}")
          for i in range(len(terms))],
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    zero = F.lit(0).cast("decimal(38,12)")

    def term_score(i: int):
        tf = F.col(f"_tf{i}").cast("double")
        df_t = F.col(f"_df{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
        )
        s = idf * (
            tf * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
        )
        return F.when(F.col(f"_tf{i}") > 0,
                      F.round(s, 9).cast("decimal(38,12)")).otherwise(zero)

    total = reduce(lambda a, c: a + c,
                   [term_score(i) for i in range(len(terms))])
    matched = reduce(lambda a, c: a | c,
                     [F.col(f"_tf{i}") > 0 for i in range(len(terms))])
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .where(matched)
        .select(F.col(id_col),
                F.round(total.cast("double"), 6).alias("bm25"))
    )
