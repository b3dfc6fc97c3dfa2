"""Iterative-graph scale smoke: connected_components + pagerank on a
synthetic graph far beyond the sf0.1 fixtures.

Usage: python tools/graph_smoke.py [n_edges]   (default 10_000_000)

The graph is generated DISTRIBUTED (spark.range + expressions — no
driver-side data) as a path + blob mix that stresses both ends of the
iterative design:

- PATHS: chains of 65,536 nodes (diameter 2^16) — the worst case for
  label propagation; pointer jumping must close them in ~16 rounds,
  not 65k. ~40% of edges.
- BLOBS: 1,000-node clusters (hub edge + a stride-7 intra edge per
  node) — dense components that converge in a couple of rounds and
  carry most of the volume. ~60% of edges.

Checks are exact, not eyeballed: the component count must equal
#chains + #blobs, the rounds taken must stay within 2 of
log2(chain length), and pagerank must return one rank per node of the
symmetrized graph. Prints one JSON line mirroring corpus_smoke.py.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from api_to_amt_data_lake_spark.operators.dedup import (  # noqa: E402
    connected_components,
)
from api_to_amt_data_lake_spark.operators.graph import (  # noqa: E402
    pagerank,
    triangle_counts,
)
from api_to_amt_data_lake_spark.session import get_spark  # noqa: E402

CHAIN_LEN = 1 << 16
BLOB_SIZE = 1000


def build_edges(spark, n_edges: int):
    """Path edges over the low node-id range, blob edges above it.
    Returns (edges_df, n_chains, n_blobs)."""
    n_path = int(n_edges * 0.4)
    n_chains = max(1, n_path // CHAIN_LEN)
    path_nodes = n_chains * CHAIN_LEN
    # chain c occupies ids [c*CHAIN_LEN, (c+1)*CHAIN_LEN); edge i -> i+1
    # except at chain tails.
    path = (
        spark.range(path_nodes)
        .filter((F.col("id") % CHAIN_LEN) != CHAIN_LEN - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    n_blob_nodes = (n_edges - (path_nodes - n_chains)) // 2
    n_blobs = max(1, n_blob_nodes // BLOB_SIZE)
    blob_nodes = n_blobs * BLOB_SIZE
    base = 1 << 40  # keep blob ids disjoint from path ids
    b = spark.range(blob_nodes).select(
        (F.col("id") + base).alias("n"),
        (F.col("id") - F.col("id") % BLOB_SIZE + base).alias("hub"),
        (F.col("id") - F.col("id") % BLOB_SIZE + base
         + (F.col("id") * 7 + 1) % BLOB_SIZE).alias("peer"),
    )
    blob = b.select(F.col("n").alias("id_a"), F.col("hub").alias("id_b")) \
        .unionByName(b.select(F.col("n").alias("id_a"),
                              F.col("peer").alias("id_b"))) \
        .filter(F.col("id_a") != F.col("id_b"))
    return path.unionByName(blob), n_chains, n_blobs


def main() -> int:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("graph_smoke")
    out: dict = {"n_edges_requested": n_edges}

    edges, n_chains, n_blobs = build_edges(spark, n_edges)
    t0 = time.time()
    edges = edges.localCheckpoint()
    out["n_edges"] = edges.count()
    out["gen_sec"] = round(time.time() - t0, 1)
    out["n_chains"], out["n_blobs"] = n_chains, n_blobs

    stats: dict = {}
    t0 = time.time()
    cc = connected_components(edges, max_iter=25, stats=stats)
    n_components = cc.select("cluster_id").distinct().count()
    out["cc_sec"] = round(time.time() - t0, 1)
    out["cc_rounds"] = stats.get("rounds")
    out["cc_converged"] = stats.get("converged")
    out["n_components"] = n_components
    expect = n_chains + n_blobs
    assert n_components == expect, (n_components, expect)
    # pointer jumping: rounds ~ log2(diameter), never O(diameter)
    assert stats["rounds"] <= math.log2(CHAIN_LEN) + 2, stats

    t0 = time.time()
    pr = pagerank(edges.unionByName(
        edges.select(F.col("id_b").alias("id_a"),
                     F.col("id_a").alias("id_b"))),
        src="id_a", dst="id_b", iters=5)
    out["pr_rows"] = pr.count()
    out["pr_sec"] = round(time.time() - t0, 1)

    # Triangles: paths contribute none; every blob node closes
    # (node, hub, peer) when its stride-7 peer is not the hub itself —
    # and the hub is each blob's highest-degree node, so the
    # degree-ordered orientation keeps its wedge fan-out tiny (the
    # skew case the orientation exists for, at volume).
    t0 = time.time()
    tri = triangle_counts(edges)
    out["tri_nodes"] = tri.count()
    out["tri_total"] = tri.agg(F.sum("n_triangles")).first()[0] // 3
    out["tri_sec"] = round(time.time() - t0, 1)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
