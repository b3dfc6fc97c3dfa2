"""Iterative graph analytics over edge DataFrames.

Companion to `operators/dedup.py::connected_components` (label
propagation): this module holds the *weighted* iterative algorithms —
currently PageRank — in the same relational, no-driver-state style:
each iteration is one join + one aggregation, both partitioned by the
join key, and nothing ever collects to the driver.

The reference pipeline has no graph analog; these operators serve the
LLM-data-pipeline side of the build brief (e.g. centrality of the
near-duplicate graph decides which copy of a duplicated document to
keep: the most-connected copy is the canonical one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected view of an edge list: both directions of every edge.
    Pair outputs (e.g. LSH candidate pairs with id_a < id_b) become a
    graph where every endpoint has out-degree >= 1."""
    return edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).unionAll(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("t"))
    )


def pagerank(
    edges: DataFrame,
    src: str = "s",
    dst: str = "t",
    iters: int = 5,
    damping: float = 0.85,
    round_to: int = 9,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list, the Pregel
    formulation: r <- (1 - d) + d * sum_in(r_src / outdeg_src), starting
    from r = 1.0. Returns (id, r) after `iters` rounds.

    Nodes with no out-edges (dangling) contribute nothing and drop out
    of the result — symmetrize() first for undirected graphs, where
    every node keeps an out-edge by construction.

    Each rank is rounded to `round_to` decimals per iteration. That is
    what makes the fixed-iteration result ENGINE-INDEPENDENT: the
    neighbor-sum is float and its accumulation order differs between
    engines (and between Spark partitionings), so without per-round
    rounding the ulp drift compounds across iterations; with it, every
    round re-lands on a shared grid and the conformance oracle can
    reproduce the values relationally (q92).

    Scale shape: the degree-annotated edge list is MATERIALIZED once
    (`checkpoint_dir` selects reliable checkpoint files for a real
    cluster, default localCheckpoint single-node) and reused every
    round — without pinning, each iteration's join would re-execute the
    whole upstream pipeline that produced the edges (for the near-dup
    graph that is the full MinHash+LSH pass, measured 5.3s -> 2.6s for
    q92 at sf0.1). An iteration is then one shuffle to co-locate ranks
    with edge sources and one partial-aggregated groupBy on the target.
    Driver holds no per-node state. Fixed small `iters` keeps the plan
    lineage shallow; for tens of iterations, pin intermediate ranks the
    way `connected_components` does.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    # (Pre-partitioning the pinned edges on "s" does NOT help: the
    # checkpoint materializes to an ExistingRDD without Catalyst
    # outputPartitioning, so the join re-shuffles regardless — verified
    # against the physical plan. The win here is purely not re-running
    # the upstream edge pipeline every round.)
    ed = e.join(deg, "s")
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        ed = ed.checkpoint()
    else:
        ed = ed.localCheckpoint()
    ranks = deg.select(F.col("s").alias("id"), F.lit(1.0).alias("r"))
    for _ in range(iters):
        ranks = (
            ed.join(ranks, ed["s"] == ranks["id"])
            .groupBy("t")
            .agg(
                F.round(
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.sum(F.col("r") / F.col("d")),
                    round_to,
                ).alias("r")
            )
            .select(F.col("t").alias("id"), "r")
        )
    return ranks
