"""Recall drift under distribution shift, and recovery by rebuild.

The persisted ANN index freezes its models at build time so that shard
appends stay mutually consistent (`sources/ann_index.py`). The cost of
that freeze is DRIFT: vectors from a shifted distribution land in
ill-fitting coarse buckets with large residuals, and recall on queries
from the new distribution degrades. `rebuild_ann_index` is the remedy —
retrain on the current corpus, re-encode, atomic generation swap. This
smoke MEASURES both halves of that story (VERDICT r7 missing item 1):

  1. Build the index on the base corpus A (sf embeddings).
  2. Append a distribution-SHIFTED shard B (A's vectors reflected and
     offset — a different region of the space, derived from testdata,
     not synthesized).
  3. recall@10 for queries drawn from B against the exact
     squared-euclidean top-10 over A ∪ B  → the DRIFTED number.
  4. `rebuild_ann_index` on A ∪ B (same hyperparameters).
  5. recall@10 again                      → the RECOVERED number.

Usage: python tools/ann_drift_smoke.py [sf_dir]   (default sf0.1)
Prints one JSON line; the headline pair goes into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from api_to_amt_data_lake_spark.operators.similarity import (  # noqa: E402
    sq_euclidean,
)
from api_to_amt_data_lake_spark.session import get_spark  # noqa: E402
from api_to_amt_data_lake_spark.sources.ann_index import (  # noqa: E402
    ann_index_append,
    ann_index_search,
    build_ann_index,
    load_ann_index,
    rebuild_ann_index,
)

K = 10
NPROBE = 4
FIT = dict(kc=16, coarse_iters=3, k=64, iters=3)
M = 16


def _recall(spark, root, queries, exact) -> float:
    got = ann_index_search(spark, root, queries, k=K, nprobe=NPROBE) \
        .select("query_id", "match_id")
    hits = got.join(exact, ["query_id", "match_id"]).count()
    return hits / exact.count()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann-drift-smoke")
    a = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")) \
        .select("vec_id", "embedding")
    n_a = a.count()
    # Shifted shard: reflect and offset every vector — same marginal
    # scale, different region; the base generation's centroids have
    # never seen it.
    b = a.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform("embedding",
                    lambda x: -x + F.lit(3.0)).alias("embedding"))
    union = a.unionByName(b).localCheckpoint()

    root = str(Path(tempfile.mkdtemp(prefix="ann_drift_")) / "idx")
    t0 = time.time()
    build_ann_index(a, root, "vec_id", "embedding", m=M, **FIT)
    t_build = time.time() - t0
    t0 = time.time()
    ann_index_append(spark, root, b)
    t_append = time.time() - t0

    queries = union.filter(F.col("vec_id") >= 1_000_000) \
        .filter(F.pmod(F.xxhash64("vec_id"), F.lit(20)) == 0) \
        .limit(25).localCheckpoint()
    exact = (
        F.broadcast(queries.select(F.col("vec_id").alias("query_id"),
                                   F.col("embedding").alias("_qv")))
        .crossJoin(union.select(F.col("vec_id").alias("match_id"),
                                F.col("embedding").alias("_cv")))
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id",
                sq_euclidean(F.col("_qv"), F.col("_cv")).alias("_d"))
        .withColumn("rk", F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("_d").asc(), F.col("match_id").asc())))
        .filter(F.col("rk") <= K).select("query_id", "match_id")
        .localCheckpoint()
    )

    r_drift = _recall(spark, root, queries, exact)
    t0 = time.time()
    gen = rebuild_ann_index(spark, union, root, **FIT)
    t_rebuild = time.time() - t0
    r_rebuilt = _recall(spark, root, queries, exact)
    *_, meta = load_ann_index(spark, root)
    # Fresh-built reference: the ceiling a rebuild should reach. (The
    # pytest parity test asserts exact equality; this smoke records it.)
    fresh = str(Path(tempfile.mkdtemp(prefix="ann_fresh_")) / "idx")
    build_ann_index(union, fresh, "vec_id", "embedding", m=M, **FIT)
    r_fresh = _recall(spark, fresh, queries, exact)

    print(json.dumps({
        "n_base": n_a, "n_shifted": n_a, "k": K, "nprobe": NPROBE,
        "recall_drifted": round(r_drift, 4),
        "recall_rebuilt": round(r_rebuilt, 4),
        "recall_fresh_built": round(r_fresh, 4),
        "generation": gen, "meta_generation": meta["generation"],
        "build_s": round(t_build, 2), "append_s": round(t_append, 2),
        "rebuild_s": round(t_rebuild, 2),
    }))


if __name__ == "__main__":
    main()
