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


def ndcg_at_k(
    ranked: DataFrame,
    query_col: str,
    rank_col: str,
    rel_col: str,
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """NDCG@k per query over a ranked result table — the standard
    graded-relevance retrieval metric (Järvelin & Kekäläinen 2002),
    the evaluation half of the BM25/RRF/ANN retrieval stack: rank a
    candidate set, join judgments, score the ranking.

    Input: one row per (query, rank, relevance) with `rank_col`
    1-based and unique per query. Output: (query, dcg, idcg, ndcg)
    with dcg = Σ_{rank<=k} (2^rel − 1)/log2(rank+1), idcg the same sum
    over the query's OWN top-k relevances re-ranked descending (the
    ideal ordering), and ndcg = dcg/idcg (0 where idcg = 0 — a query
    with no relevant results scores 0, the TREC convention).

    Scale shape: two partial-aggregated groupBys on the query key plus
    one window for the ideal re-rank — the window partitions by query,
    so state is bounded by a query's candidate list, never the corpus.
    All-expression math; per-row terms are rounded to 9dp and folded
    through an exact decimal sum (the engine's cross-engine float
    discipline), so the result is accumulation-order-independent and
    the conformance oracle (q99zzm) reproduces it bit-for-bit."""
    from pyspark.sql import Window

    q = F.col(query_col)
    gain = (F.pow(F.lit(2.0), F.col(rel_col).cast("double")) - 1.0)

    def _fold(term):
        return F.round(
            F.sum(F.round(term, 9).cast("decimal(38,12)"))
            .cast("double"), round_to)

    dcg = (
        ranked.filter(F.col(rank_col) <= k)
        .groupBy(q.alias("_q"))
        .agg(_fold(gain / F.log2(F.col(rank_col).cast("double") + 1.0))
             .alias("dcg"))
    )
    # Ideal ordering: this query's relevances sorted descending (rank
    # as the deterministic tie-break), re-discounted at positions 1..k.
    w = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).cast("double").desc(), F.col(rank_col).asc())
    ideal = (
        ranked.withColumn("_irk", F.row_number().over(w))
        .filter(F.col("_irk") <= k)
        .groupBy(q.alias("_q"))
        .agg(_fold(gain / F.log2(F.col("_irk").cast("double") + 1.0))
             .alias("idcg"))
    )
    return (
        dcg.join(ideal, "_q")
        .select(F.col("_q").alias(query_col), "dcg", "idcg",
                F.round(F.when(F.col("idcg") > 0,
                               F.col("dcg") / F.col("idcg"))
                        .otherwise(F.lit(0.0)), round_to).alias("ndcg"))
    )


def mean_reciprocal_rank(
    ranked: DataFrame,
    group_cols: list[str],
    query_col: str,
    rank_col: str,
    rel_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Mean reciprocal rank per group over the `ndcg_at_k` ranked-
    results shape — THE single-number navigational-retrieval metric
    (how high is the FIRST relevant hit?), the companion to NDCG
    (graded list quality) and P/R@k (set quality). A query's
    reciprocal rank is 1/rank of its first relevant result (relevance
    > 0), 0 if none (TREC convention, matching ndcg/recall); MRR
    averages over ALL the group's queries, including the zero ones.
    Output: (groups…, n_queries, mrr).

    Scale shape: one filtered min-aggregation on the query key, one
    group aggregation joined against the per-group query count — pure
    counts and one division per query, windows nowhere. Per-query
    reciprocal ranks are rounded to 9dp and folded through an exact
    decimal sum so the group mean is accumulation-order-independent
    (the oracle reproduces it bit-for-bit)."""
    g = list(group_cols)
    first_rel = (
        ranked.filter(F.col(rel_col) > 0)
        .groupBy(*g, F.col(query_col).alias("_q"))
        .agg(F.min(F.col(rank_col)).alias("_fr"))
        .select(*g, "_q",
                F.round(F.lit(1.0) / F.col("_fr").cast("double"), 9)
                .cast("decimal(38,12)").alias("_rr"))
    )
    n_q = (ranked.groupBy(*g)
           .agg(F.countDistinct(query_col).alias("n_queries")))
    rr_sum = first_rel.groupBy(*g).agg(F.sum("_rr").alias("_s"))
    return (
        n_q.join(rr_sum, g, "left")
        .select(*g, "n_queries",
                F.round(F.coalesce(F.col("_s"), F.lit(0))
                        .cast("double") / F.col("n_queries"),
                        round_to).alias("mrr"))
    )


def precision_recall_at_k(
    ranked: DataFrame,
    query_col: str,
    rank_col: str,
    rel_col: str,
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Precision@k and recall@k per query over the same ranked-results
    shape as `ndcg_at_k` (relevance > 0 counts as relevant — the
    binary view of graded judgments). Output: (query, n_rel_at_k,
    n_rel_total, precision, recall); recall = 0 for queries with no
    relevant result (the TREC convention, matching ndcg's).

    Two partial-aggregated groupBys on the query key, pure counts —
    exact at any scale, no float folding needed."""
    q = F.col(query_col)
    is_rel = (F.col(rel_col) > 0).cast("int")
    at_k = (ranked.filter(F.col(rank_col) <= k)
            .groupBy(q.alias("_q"))
            .agg(F.sum(is_rel).alias("n_rel_at_k")))
    total = (ranked.groupBy(q.alias("_q"))
             .agg(F.sum(is_rel).alias("n_rel_total")))
    return (
        total.join(at_k, "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            F.coalesce("n_rel_at_k", F.lit(0)).alias("n_rel_at_k"),
            "n_rel_total",
            F.round(F.coalesce("n_rel_at_k", F.lit(0)).cast("double")
                    / F.lit(float(k)), round_to).alias("precision"),
            F.round(F.when(F.col("n_rel_total") > 0,
                           F.coalesce("n_rel_at_k", F.lit(0))
                           .cast("double") / F.col("n_rel_total"))
                    .otherwise(F.lit(0.0)), round_to).alias("recall"),
        )
    )
