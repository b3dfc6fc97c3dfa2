"""Persisted IVFPQ ANN index with incremental shard append.

The similarity operators (`operators/similarity.py`) train, encode and
search within one query lineage; this module gives the trained index a
durable, incrementally-maintainable form — the missing half of
SCALE.md's "index the corpus shard by shard" story, and the ANN
counterpart of the incremental-LSH band store
(`operators/dedup.py::lsh_incremental`) and the versioned silver
snapshots (`sources/incremental.py`).

Layout under `index_root`:

    meta.json            id/vec column names, m, and the shard log
    coarse/              parquet — kc coarse centroid rows (the model)
    book/                parquet — m x k PQ codebook rows (the model)
    codes/bucket=<b>/    parquet — (id, sub_idx, code) PARTITIONED BY
                         the coarse bucket id; appends add files, never
                         rewrite

Why this shape at 100 TB:

- The models (kc x dim centroids + m x k codebook) are broadcast-sized
  and IMMUTABLE once trained — appending a shard never retrains, so the
  whole index stays consistent: every code in every shard was produced
  by the same folded encode expression.
- Codes are hive-partitioned by the coarse bucket id, so a search with
  nprobe << kc reads ONLY the probed buckets' files (partition
  pruning) — the scan cost tracks nprobe/kc of the index, matching the
  IVF contract, and `ivfpq_append` writes only NEW files into the
  touched bucket directories (mode=append): existing shard files are
  never read or rewritten, so append cost tracks the increment.
- The append's encode is the post-training folded shape
  (`ivf_residuals(folded=True)` + `_folded_pq_pairs_expr`): bucket,
  residual and all m codes are computed inline per row — a pure scan
  projection over the new shard with zero shuffle and zero join
  (plan-audited in tests/test_ann_index.py). The WRITE then clusters
  the increment's code rows by bucket (one increment-sized exchange)
  so each append adds ~one file per touched bucket.

Equivalence contract (q95e): search over a LOADED + APPENDED index
hash-matches `ivfpq_topk` over the union corpus encoded in one lineage,
because both paths fold the identical model into the identical encode
expression — verified against the fully-unrolled DuckDB oracle.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators.similarity import (
    _folded_pq_pairs_expr,
    ivf_probe_buckets,
    ivf_residuals,
    ivfpq_fit,
    ivfpq_topk,
)

_META = "meta.json"


def save_ann_index(
    index_root: str,
    coarse: DataFrame,
    book: DataFrame,
    codes: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
) -> None:
    """Persist a trained IVFPQ index (the `ivfpq_fit` triple). Overwrites
    any index already at `index_root`. Codes land partitioned by the
    coarse bucket id; the models are single small parquet files."""
    if os.path.isdir(index_root):
        shutil.rmtree(index_root)
    os.makedirs(index_root)
    coarse.write.parquet(os.path.join(index_root, "coarse"))
    book.write.parquet(os.path.join(index_root, "book"))
    # Cluster by bucket before partitionBy — unclustered partitioned
    # writes emit tasks × buckets small files (SCALE.md failure mode 8).
    (codes.repartition(F.col("bucket")).write.partitionBy("bucket")
     .parquet(os.path.join(index_root, "codes")))
    meta = {"id_col": id_col, "vec_col": vec_col, "m": int(m),
            "appended_shards": 0}
    with open(os.path.join(index_root, _META), "w") as f:
        json.dump(meta, f)


def build_ann_index(
    corpus: DataFrame, index_root: str, id_col: str, vec_col: str,
    kc: int = 4, coarse_iters: int = 2, m: int = 2, k: int = 4,
    iters: int = 2, sample_frac: float | None = None,
) -> None:
    """Train (`ivfpq_fit`) and persist in one call. `sample_frac` is the
    production fit shape: trainers iterate over the deterministic
    id-hash sample; the corpus is scanned only by the residual and
    encode passes."""
    coarse, book, codes = ivfpq_fit(
        corpus, id_col, vec_col, kc=kc, coarse_iters=coarse_iters, m=m,
        k=k, iters=iters, sample_frac=sample_frac)
    save_ann_index(index_root, coarse, book, codes, id_col, vec_col, m)


def load_ann_index(
    spark: SparkSession, index_root: str,
) -> tuple[DataFrame, DataFrame, DataFrame, dict]:
    """(coarse, book, codes, meta) from a persisted index. The codes
    frame keeps its hive bucket partitioning, so `bucket` filters prune
    at the file level."""
    with open(os.path.join(index_root, _META)) as f:
        meta = json.load(f)
    coarse = spark.read.parquet(os.path.join(index_root, "coarse"))
    book = spark.read.parquet(os.path.join(index_root, "book"))
    codes = spark.read.parquet(os.path.join(index_root, "codes"))
    return coarse, book, codes, meta


def encode_shard(
    shard: DataFrame, coarse: DataFrame, book: DataFrame,
    id_col: str, vec_col: str,
) -> DataFrame:
    """(id, bucket, sub_idx, code) for a shard against loaded models —
    the append's encode plan, exposed unexecuted so tests can audit it:
    both models fold into the scan as literals (`folded=True` residuals
    + inline PQ codes), so this is a pure projection over the shard with
    zero Exchange and zero join."""
    res = ivf_residuals(shard, coarse, id_col, vec_col, folded=True)
    pairs = _folded_pq_pairs_expr(vec_col, book)
    return res.select(
        F.col(id_col), F.col("bucket"), F.explode(pairs).alias("_p")
    ).select(id_col, "bucket", F.col("_p.sub_idx").alias("sub_idx"),
             F.col("_p.code").alias("code"))


def ann_index_append(
    spark: SparkSession, index_root: str, shard: DataFrame,
) -> None:
    """Fold a NEW shard of vectors into the persisted index without
    retraining and without touching existing code files.

    The loaded models are folded into the shard scan (`encode_shard`),
    so the encode is one scan projection over the increment — zero
    shuffle, zero join; the write clusters the increment's code rows by
    bucket (one increment-sized exchange) and adds only new files under
    the touched bucket dirs. The caller owns id uniqueness across
    shards (same contract as the incremental-LSH store)."""
    coarse, book, codes, meta = load_ann_index(spark, index_root)
    new_codes = encode_shard(shard, coarse, book,
                             meta["id_col"], meta["vec_col"])
    # Cluster the increment by bucket before the partitioned append —
    # the exchange carries only the shard's code rows, and each append
    # adds ~one file per touched bucket instead of tasks × buckets.
    (new_codes.repartition(F.col("bucket"))
     .write.mode("append").partitionBy("bucket")
     .parquet(os.path.join(index_root, "codes")))
    meta["appended_shards"] = int(meta.get("appended_shards", 0)) + 1
    tmp = os.path.join(index_root, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_root, _META))


def ann_index_search(
    spark: SparkSession, index_root: str, queries: DataFrame,
    k: int = 3, nprobe: int = 1, prune: bool = True,
) -> DataFrame:
    """IVFPQ top-k over the persisted index (same output contract as
    `ivfpq_topk`: query_id, match_id, adc_dist, rank).

    With `prune` (default), the probed bucket ids — at most
    |queries| x nprobe values, and queries are few by the ANN contract —
    are collected and pushed as a `bucket IN (...)` partition filter, so
    the codes scan reads only the probed buckets' files: at 100 TB the
    search touches nprobe/kc of the index bytes, not all of them."""
    coarse, book, codes, meta = load_ann_index(spark, index_root)
    id_col, vec_col, m = meta["id_col"], meta["vec_col"], meta["m"]
    if prune:
        probed = [
            r["bucket"]
            for r in ivf_probe_buckets(queries, coarse, id_col, vec_col,
                                       nprobe)
            .select("bucket").distinct().collect()
        ]
        codes = codes.filter(F.col("bucket").isin(probed))
    return ivfpq_topk(queries, coarse, book, codes, id_col, vec_col,
                      m=m, k=k, nprobe=nprobe)
