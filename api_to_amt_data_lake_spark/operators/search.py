"""Lexical ranked retrieval (BM25) over a document corpus.

Complements the vector side (`operators/similarity.py`) with the
term-based ranking a data-curation stack uses for targeted corpus
probes ("find the docs about X to audit/remove/upsample"). Pure
relational plan:

- the token stream is filtered to the query's terms BEFORE any
  aggregation, so the tf shuffle carries only matching (doc, term) rows
  — at 100 TB the non-matching 99.99% of tokens never leaves the scan;
- document length and corpus stats are one global aggregate (broadcast
  back, a few rows);
- per-term document frequencies are |query| rows — broadcast.

Determinism: each term's BM25 contribution is rounded to 9dp and summed
in DECIMAL(38,12) (exact, order-insensitive), the same fold contract
the cosine/surprisal ops use, so results hash-match the SQL oracle.
"""

from __future__ import annotations

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
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.sum("dl").alias("sum_dl"), F.count(F.lit(1)).alias("n_docs")
    )
    tf = (
        toks.where(F.col("tok").isin(terms))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df_t"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
    )
    term_score = idf * (
        F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf")
           + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
    )
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.round(term_score, 9).cast("decimal(38,12)").alias("term"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("term").cast("double"), 6).alias("bm25"))
    )
