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
        from api_to_amt_data_lake_spark.operators.checkpoints import (
            scoped_checkpoint_dir,
        )
        with scoped_checkpoint_dir(edges.sparkSession, checkpoint_dir):
            ed = ed.checkpoint()  # eager: materialized inside scope
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


def triangle_counts(edges: DataFrame, src: str = "id_a",
                    dst: str = "id_b") -> DataFrame:
    """Per-node triangle participation counts over an undirected edge
    list — the clustering-structure primitive (cohesion of near-dup
    clusters, community density). Output: (id, n_triangles), nodes in
    ≥1 triangle.

    Degree-ordered orientation (the classic distributed formulation):
    orient every edge from its lower-(degree, id) endpoint to the
    higher one, so each triangle {x ≺ y ≺ z} is found EXACTLY once as
    the wedge x→y, x→z closed by y→z — and, crucially, every node's
    oriented out-degree is O(√m), which bounds the wedge join's
    per-key fan-out even at power-law degree skew (a naive a<b-id
    orientation lets one low-id hub own quadratic wedge work). Two
    shuffle joins on node keys + one closing join on the (y, z) pair;
    nothing driver-side. Parity-tested against a naive enumeration.
    """
    e = (
        edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                     F.greatest(F.col(src), F.col(dst)).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    )
    keyed = (
        e.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("_da")),
               "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("_db")),
              "b")
    )
    a_first = (F.struct(F.col("_da"), F.col("a"))
               < F.struct(F.col("_db"), F.col("b")))
    o = keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("t"),
        F.when(a_first, F.col("_db")).otherwise(F.col("_da")).alias("_dt"),
    )
    wedge = (
        o.alias("e1").join(o.alias("e2"), "s")
        .filter(F.struct(F.col("e1._dt"), F.col("e1.t"))
                < F.struct(F.col("e2._dt"), F.col("e2.t")))
        .select(F.col("s").alias("x"), F.col("e1.t").alias("y"),
                F.col("e2.t").alias("z"))
    )
    tri = wedge.join(
        o.select(F.col("s").alias("y"), F.col("t").alias("z")), ["y", "z"])
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("id"))
        .groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def khop_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "s",
    dst: str = "t",
    node_col: str = "node",
    max_hops: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Level-synchronous BFS: minimum hop distance (≤ max_hops) from
    any seed, over a directed edge list — (node, dist) for every node
    reached. The multi-source shortest-hop primitive behind "within k
    links of a flagged document" blast-radius queries on the near-dup
    graph (symmetrize() first for undirected semantics).

    Each round expands only the FRONTIER (nodes first reached last
    round): one equi join frontier ⋈ edges plus one anti join against
    the settled set — work per round tracks the frontier, not the
    graph, and a round's result is pinned so later joins do not
    re-execute the whole expansion lineage. Early-exits when a
    frontier comes back empty. Level-synchronous BFS discovers every
    node first at its true minimum distance, so no relaxation or
    re-visit pass is needed — the relational equivalent of the
    recursive-CTE walk the conformance oracle (q99zz) runs.

    Lineage (VERDICT r9 item 2): `checkpoint_dir` selects reliable
    `checkpoint()` files for the per-round pins (use on a real
    cluster: survives executor loss — BFS is a long-lineage iterative
    operator exactly like `pagerank`); the default `localCheckpoint()`
    pins blocks to executors and is only safe single-node. The context
    checkpoint dir is set only around each (eager) checkpoint and the
    previous value restored."""
    from api_to_amt_data_lake_spark.operators.checkpoints import (
        scoped_checkpoint_dir,
    )

    def _pin(df: DataFrame) -> DataFrame:
        if checkpoint_dir is None:
            return df.localCheckpoint()
        with scoped_checkpoint_dir(df.sparkSession, checkpoint_dir):
            return df.checkpoint()  # eager: materialized inside scope

    # Edges pinned ONCE, like pagerank's degree-annotated list: without
    # the pin every hop's frontier join re-executes the caller's whole
    # edge pipeline (for q99zz that is the corpus scan + distinct +
    # symmetrize, re-run per hop).
    e = _pin(edges.select(F.col(src).alias("_s"), F.col(dst).alias("_t")))
    dist = _pin(seeds.select(F.col(node_col).alias("node")).distinct()
                .withColumn("dist", F.lit(0)))
    frontier = dist
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["_s"])
            .select(F.col("_t").alias("node"))
            .distinct()
        )
        new = _pin(nxt.join(dist, "node", "left_anti")
                   .withColumn("dist", F.lit(hop)))
        if new.isEmpty():
            break
        # No pin on the union: both operands are already pinned, so the
        # next hop's anti join reads their blocks directly — the former
        # per-hop union pin was a third driver action re-materializing
        # rows that were all pinned already.
        dist = dist.unionAll(new)
        frontier = new
    return dist


def label_propagation(
    edges: DataFrame,
    src: str = "s",
    dst: str = "t",
    iters: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007 — community
    detection over the near-dup / co-occurrence graph): every node
    starts labeled with its own id; each round EVERY node
    simultaneously adopts the most frequent label among its in-
    neighbors under the previous round's labels (count desc, smallest
    label as the tie-break); a node with NO in-edges keeps its
    previous-round label (so its out-votes never vanish — advisor r10:
    dropping in-edge-less nodes from the label table silently lost
    their contribution from round 2 on directed graphs). Returns
    (id, label) after `iters` rounds for every node appearing in the
    edge list — `symmetrize()` first for undirected semantics.

    Synchronous, not asynchronous, ON PURPOSE: the async variant's
    result depends on visit order (engine- and partitioning-dependent),
    while the synchronous update with a total tie-break order is a pure
    function of (graph, round count) — the conformance oracle (q99zzk)
    reproduces it as unrolled SQL rounds. Fixed small `iters` matches
    LPA practice (it converges or cycles within a few rounds).

    Scale shape (the pagerank contract): the edge list is pinned once
    and reused; a round is one shuffle to co-locate labels with edge
    sources, one partial-aggregated (t, label) count, and one argmax
    per node folded into a single min(struct) aggregation — no windows,
    no driver state. `checkpoint_dir` selects reliable checkpoint files
    (cluster-safe); the default localCheckpoint is single-node-only.
    The context checkpoint dir is set only around the (eager)
    checkpoint and the previous value restored."""
    from api_to_amt_data_lake_spark.operators.checkpoints import (
        scoped_checkpoint_dir,
    )

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    if checkpoint_dir is not None:
        with scoped_checkpoint_dir(edges.sparkSession, checkpoint_dir):
            e = e.checkpoint()  # eager: materialized inside scope
    else:
        e = e.localCheckpoint()
    labels = (e.select(F.col("s").alias("id"))
              .union(e.select(F.col("t").alias("id"))).distinct()
              .withColumn("label", F.col("id")))
    for _ in range(iters):
        counts = (
            e.join(labels, e["s"] == labels["id"])
            .groupBy("t", "label").agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax(count) with min-label tie-break as ONE aggregation:
        # min over struct(-count, label).
        voted = (
            counts.groupBy("t")
            .agg(F.min(F.struct((-F.col("cnt")).alias("nc"),
                                F.col("label"))).alias("m"))
            .select(F.col("t").alias("id"),
                    F.col("m.label").alias("_new"))
        )
        # In-edge-less nodes carry their previous label forward (a
        # no-op join on symmetrized graphs, where every node votes).
        labels = (
            labels.join(voted, "id", "left")
            .select("id", F.coalesce("_new", "label").alias("label"))
        )
    return labels
