"""Persisted IVFPQ ANN index with incremental shard append.

The similarity operators (`operators/similarity.py`) train, encode and
search within one query lineage; this module gives the trained index a
durable, incrementally-maintainable form — the missing half of
SCALE.md's "index the corpus shard by shard" story, and the ANN
counterpart of the incremental-LSH band store
(`operators/dedup.py::lsh_incremental`) and the versioned silver
snapshots (`sources/incremental.py`).

Layout under `index_root`:

    meta.json            id/vec column names, m, the shard log, and the
                         MANIFEST POINTER MAP: bucket dir → committed
                         sidecar file (size bounded by BUCKET count)
    manifests/           immutable per-bucket sidecar jsons, each the
                         committed file list of one bucket (VERDICT r10
                         item 3: at real shard counts an inline file
                         list made meta.json itself the commit
                         bottleneck; a writer now rewrites only the
                         TOUCHED buckets' sidecars and meta stays
                         O(buckets))
    coarse/              parquet — kc coarse centroid rows (the model)
    book/                parquet — m x k PQ codebook rows (the model)
    codes/bucket=<b>/    parquet — (id, sub_idx, code) PARTITIONED BY
                         the coarse bucket id; appends add files, never
                         rewrite

Reader-atomic commits (VERDICT r8 item 1): readers never list the
codes directory — `load_ann_index` builds the codes frame from the
committed manifest (`_manifest_get`: meta's pointer map → sidecar
lists; legacy inline `codes_files` still readable), read with
`basePath` so hive bucket partition pruning is preserved. Sidecars are
immutable: a writer stages NEW sidecar files for the buckets it
touched, and the single atomic meta.json replace publishes them all at
once — the commit point is unchanged. Retired sidecars are tracked in
`meta["superseded_manifests"]` and reclaimed under the same retention
window as superseded code files. A writer
(append / compaction) first lands files on disk — invisible, because
no reader resolves them — and COMMITS by atomically replacing
meta.json (`os.replace`), so an append is all-or-nothing to every
concurrent search: a reader sees the index at some whole number of
committed shards, never a partially-visible one. Crash debris (files
written but never committed) is swept by the next writer operation;
compaction/dedupe record the files they superseded with a commit
timestamp, and the sweep retains them for the index's configurable
`sweep_grace_seconds` (default 0 = one writer cycle) — a reader that
re-loads within the retention window can never hit FileNotFound;
`expire_superseded` reclaims early (the Iceberg snapshot/expire
discipline, scaled down to one JSON manifest).

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


class ConcurrentWriterError(RuntimeError):
    """A second writer raced an append/compaction/rebuild on the same
    index root. The index is single-writer by contract; the advisory
    lock turns a silent race (interleaved stage/sweep could delete a
    concurrent writer's staged files) into a fail-fast error. Retry
    after the other writer finishes, or serialize writers upstream."""


from contextlib import contextmanager  # noqa: E402


@contextmanager
def _writer_lock(index_root: str):
    """Advisory exclusive lock for writer operations, held for the
    whole stage+commit (append), rewrite+commit (compaction) or
    retrain+swap (rebuild). A SIBLING of the root (`<root>.writer.lock`)
    so generation renames never move the locked inode. Non-blocking:
    contention raises ConcurrentWriterError instead of silently
    interleaving two writers' sweeps. flock is best-effort on network
    filesystems — on NFS/object stores the single-writer contract still
    needs upstream coordination (documented); locally and on most
    clustered POSIX mounts it is enforced here."""
    path = str(index_root).rstrip(os.sep) + ".writer.lock"
    f = open(path, "w")
    try:
        import fcntl
        try:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            f.close()
            raise ConcurrentWriterError(
                f"another writer holds {path}; the persisted ANN index "
                "is single-writer — retry after it finishes") from None
    except ImportError:  # non-POSIX: contract stays documentation-only
        pass
    try:
        yield
    finally:
        f.close()  # closing releases the flock


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


def _list_codes_files(root: str) -> set[str]:
    """Relative paths (`bucket=<b>/<part>.parquet`) of every parquet
    file currently ON DISK under codes/ — the writer-side view. Readers
    never call this; they resolve files through the committed manifest
    in meta.json."""
    codes = os.path.join(root, "codes")
    out: set[str] = set()
    if not os.path.isdir(codes):
        return out
    for d in os.listdir(codes):
        if not d.startswith("bucket="):
            continue
        bdir = os.path.join(codes, d)
        for f in os.listdir(bdir):
            if f.endswith(".parquet") and not f.startswith("."):
                out.add(f"{d}/{f}")
    return out


def _read_meta(root: str) -> dict:
    with open(os.path.join(root, _META)) as f:
        return json.load(f)


def _write_meta_atomic(root: str, meta: dict) -> None:
    """THE commit point for append/compaction: readers resolve code
    files only through meta's manifest, so this single `os.replace`
    makes a writer's staged files visible all-or-nothing."""
    tmp = os.path.join(root, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(root, _META))


_MANIFESTS = "manifests"


def _manifest_get(root: str, meta: dict) -> list[str] | None:
    """The committed code-file list, resolved through whichever
    manifest form the index carries: the SHARDED per-bucket sidecars
    (`meta["manifest"]`: bucket dir → sidecar json under `manifests/`,
    the current form — meta.json stays bounded by BUCKET count, VERDICT
    r10 item 3) or the legacy inline `meta["codes_files"]` list. None =
    no manifest at all (pre-manifest index; callers fall back to the
    directory listing)."""
    if "codes_files" in meta:
        return sorted(meta["codes_files"])
    man = meta.get("manifest")
    if man is None:
        return None
    out: list[str] = []
    for rel in man.values():
        with open(os.path.join(root, _MANIFESTS, rel)) as f:
            out.extend(json.load(f))
    return sorted(out)


def _manifest_set(root: str, meta: dict, files) -> None:
    """Stage `files` (relative code paths) as the manifest state:
    write a NEW immutable sidecar json per bucket whose list changed
    (never overwrite — a concurrent reader may be resolving the old
    one) and point `meta["manifest"]` at the new set. NOT the commit:
    the caller's next `_write_meta_atomic` is, and it publishes every
    touched bucket's new sidecar in that single atomic replace.
    Replaced/retired sidecars are tracked in
    `meta["superseded_manifests"]` (rel → unix time) and reclaimed by
    the sweep under the same `sweep_grace_seconds` retention window as
    superseded code files."""
    import time
    import uuid

    per_bucket: dict[str, list[str]] = {}
    for rel in files:
        per_bucket.setdefault(rel.split("/", 1)[0], []).append(rel)
    man = dict(meta.get("manifest") or {})
    mdir = os.path.join(root, _MANIFESTS)
    os.makedirs(mdir, exist_ok=True)
    now = time.time()
    retired: list[str] = []
    for bucket in sorted(set(man) | set(per_bucket)):
        new_list = sorted(per_bucket.get(bucket, ()))
        cur = man.get(bucket)
        if cur is not None:
            try:
                with open(os.path.join(mdir, cur)) as f:
                    if json.load(f) == new_list:
                        continue  # unchanged bucket: sidecar reused
            except OSError:
                pass
            retired.append(cur)
        if not new_list:
            man.pop(bucket, None)
            continue
        name = f"{bucket}.{uuid.uuid4().hex}.json"
        tmp = os.path.join(mdir, f".{name}.tmp")
        with open(tmp, "w") as f:
            json.dump(new_list, f)
        os.replace(tmp, os.path.join(mdir, name))
        man[bucket] = name
    if retired:
        sup = meta.setdefault("superseded_manifests", {})
        for rel in retired:
            sup[rel] = now
    meta["manifest"] = man
    meta.pop("codes_files", None)


def committed_files(index_root: str) -> set[str]:
    """Public read of the committed manifest (tests / ops tooling)."""
    root = str(index_root)
    return set(_manifest_get(root, _read_meta(root)) or ())


def _sweep_manifests(root: str, meta: dict) -> list[str]:
    """Sidecar GC, mirroring `_sweep_uncommitted`'s two kinds: on-disk
    manifest jsons not referenced by meta are crash debris (deleted
    now) unless tracked as superseded within the retention window (a
    reader holding the previous meta may still resolve them)."""
    import time

    mdir = os.path.join(root, _MANIFESTS)
    if not os.path.isdir(mdir):
        return []
    live = set((meta.get("manifest") or {}).values())
    superseded = meta.get("superseded_manifests", {})
    grace = float(meta.get("sweep_grace_seconds", 0.0))
    now = time.time()
    removed = []
    on_disk = {f for f in os.listdir(mdir)
               if f.endswith(".json") and not f.startswith(".")}
    for rel in on_disk - live:
        if rel in superseded and now - float(superseded[rel]) < grace:
            continue
        try:
            os.remove(os.path.join(mdir, rel))
        except OSError:
            continue
        removed.append(rel)
    gone = [rel for rel in superseded
            if rel in removed or rel not in on_disk]
    for rel in gone:
        superseded.pop(rel)
    if not superseded:
        meta.pop("superseded_manifests", None)
    return removed


def _ensure_manifest(root: str, meta: dict) -> None:
    """Upgrade older index forms in place: a pre-manifest index's
    directory listing IS its committed state, so snapshot it; a legacy
    inline `codes_files` list is resharded into per-bucket sidecars.
    Writers call this before staging anything new; no-op when the
    sharded manifest is already present."""
    if "manifest" in meta and "codes_files" not in meta:
        return
    files = (meta["codes_files"] if "codes_files" in meta
             else sorted(_list_codes_files(root)))
    _manifest_set(root, meta, files)
    _write_meta_atomic(root, meta)


def _sweep_uncommitted(root: str, meta: dict) -> list[str]:
    """Writer-side GC (single-writer contract): delete on-disk code
    files that are NOT in the committed manifest. Two kinds, treated
    differently (VERDICT r9 item 5 — Iceberg's snapshot-then-expire
    discipline, scaled down to one JSON manifest):

    - CRASH DEBRIS (untracked): files an append/compaction staged but
      never committed. No reader ever resolved them through a manifest,
      so they are deleted immediately.
    - SUPERSEDED (tracked in `meta["superseded"]`, rel → unix time of
      the commit that replaced them): files a committed compaction /
      dedupe rewrote. A reader holding an older manifest may still be
      scanning them, so they are retained for the index's
      `sweep_grace_seconds` (set at build time or via
      `set_sweep_grace`; default 0 = deleted at the next writer op, the
      one-writer-cycle grace of earlier rounds). With a grace of, say,
      600 s, no reader that re-loads the index at least every 10
      minutes can EVER hit FileNotFound — the retention window replaces
      the transient-retry contract.

    Mutates `meta` (pruning tracking entries for files now gone); the
    caller's next `_write_meta_atomic` persists that — a crash before
    it merely re-prunes next time. Returns the relative paths removed.
    """
    import time

    committed = set(_manifest_get(root, meta) or ())
    superseded = meta.get("superseded", {})
    grace = float(meta.get("sweep_grace_seconds", 0.0))
    now = time.time()
    removed = []
    on_disk = _list_codes_files(root)
    for rel in on_disk - committed:
        if rel in superseded and now - float(superseded[rel]) < grace:
            continue  # retention window: a stale reader may hold it
        path = os.path.join(root, "codes", rel)
        try:
            os.remove(path)
        except OSError:
            continue
        # LocalFileSystem checksum sidecars ride along with their file.
        d, name = os.path.split(path)
        crc = os.path.join(d, f".{name}.crc")
        if os.path.isfile(crc):
            os.remove(crc)
        removed.append(rel)
    gone = [rel for rel in superseded
            if rel in removed or rel not in on_disk]
    for rel in gone:
        superseded.pop(rel)
    if not superseded:
        meta.pop("superseded", None)
    _sweep_manifests(root, meta)  # sidecar debris rides the same sweep
    return removed


def _mark_superseded(meta: dict, rels) -> None:
    """Record `rels` as superseded-at-now in meta's tracking map —
    called at the commit that replaces them, BEFORE the caller's
    `_write_meta_atomic`, so the retention clock and the removal from
    the manifest are one atomic write."""
    import time

    now = time.time()
    sup = meta.setdefault("superseded", {})
    for rel in rels:
        sup[rel] = now


def set_sweep_grace(index_root: str, seconds: float) -> None:
    """Set the index's superseded-file retention window (see
    `_sweep_uncommitted`). Persisted in meta, carried across rebuild
    generations; takes effect from the next writer operation."""
    root = str(index_root)
    with _writer_lock(root):
        meta = _read_meta(root)
        meta["sweep_grace_seconds"] = float(seconds)
        _write_meta_atomic(root, meta)


def expire_superseded(index_root: str,
                      min_age_seconds: float = 0.0) -> list[str]:
    """Force-expire tracked superseded files older than
    `min_age_seconds`, regardless of the index's grace setting — the
    ops lever for reclaiming space early (Iceberg's expire_snapshots).
    Returns the relative paths removed."""
    import time

    root = str(index_root)
    with _writer_lock(root):
        meta = _read_meta(root)
        superseded = dict(meta.get("superseded", {}))
        now = time.time()
        removed = []
        for rel, ts in superseded.items():
            if now - float(ts) < min_age_seconds:
                continue
            path = os.path.join(root, "codes", rel)
            try:
                os.remove(path)
            except OSError:
                pass
            # LocalFileSystem checksum sidecars ride along (same as
            # _sweep_uncommitted) — early expiry must not orphan them.
            d, name = os.path.split(path)
            crc = os.path.join(d, f".{name}.crc")
            try:
                if os.path.isfile(crc):
                    os.remove(crc)
            except OSError:
                pass
            meta["superseded"].pop(rel, None)
            removed.append(rel)
        if not meta.get("superseded"):
            meta.pop("superseded", None)
        # Retired manifest sidecars ride the same early-reclaim lever.
        for rel, ts in dict(meta.get("superseded_manifests",
                                     {})).items():
            if now - float(ts) < min_age_seconds:
                continue
            try:
                os.remove(os.path.join(root, _MANIFESTS, rel))
            except OSError:
                pass
            meta["superseded_manifests"].pop(rel, None)
            removed.append(f"{_MANIFESTS}/{rel}")
        if not meta.get("superseded_manifests"):
            meta.pop("superseded_manifests", None)
        _write_meta_atomic(root, meta)
        return removed


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
    sweep_grace_seconds: float = 0.0,
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
    with _writer_lock(root):
        return _save_locked(root, coarse, book, codes, id_col, vec_col,
                            m, generation, extra_files, rotation,
                            opq_iters, sweep_grace_seconds)


_MODEL_ARROW_TYPES = {
    "bigint": "int64", "int": "int32", "double": "float64",
    "string": "string", "array<double>": "list<float64>",
}


def _write_model_parquet(df: DataFrame, path: str) -> None:
    """Persist a MODEL frame (kc×dim centroids / m×k codebook) as one
    parquet file. Trainer outputs carry their rows as a stash
    (`kmeans_fit`/`pq_fit`), so the write runs driver-side via pyarrow
    — zero Spark jobs, zero commit protocol — with the arrow schema
    derived from the frame's own dtypes so a reload sees the exact
    types a Spark write would have produced (guide §1.2: a model write
    is model-sized work; the two per-save actions it replaces were
    pure fixed cost). Frames without a stash, or with dtypes outside
    the model vocabulary, take the Spark write path unchanged."""
    rows = getattr(df, "_model_rows", None)
    if rows is not None and all(t in _MODEL_ARROW_TYPES
                                for _, t in df.dtypes):
        import pyarrow as pa
        import pyarrow.parquet as pq

        def arrow_t(t: str):
            return (pa.list_(pa.float64()) if t == "array<double>"
                    else getattr(pa, _MODEL_ARROW_TYPES[t])())

        cols = df.columns
        data = [dict(zip(cols, r)) if not isinstance(r, dict) else r
                for r in rows]
        table = pa.table(
            {c: pa.array([d[c] for d in data], type=arrow_t(t))
             for (c, t) in df.dtypes})
        os.makedirs(path, exist_ok=True)
        pq.write_table(table, os.path.join(path, "part-00000.parquet"))
        return
    df.write.parquet(path)


def _save_locked(root, coarse, book, codes, id_col, vec_col, m,
                 generation, extra_files, rotation, opq_iters,
                 sweep_grace_seconds=0.0) -> None:
    tmp, old = root + "._tmp", root + "._old"
    _repair_root(root)  # a prior crash between the two renames
    for leftover in (tmp, old):  # crash debris from a prior swap
        shutil.rmtree(leftover, ignore_errors=True)
    os.makedirs(tmp)
    _write_model_parquet(coarse, os.path.join(tmp, "coarse"))
    _write_model_parquet(book, os.path.join(tmp, "book"))
    # Cluster by bucket before partitionBy — unclustered partitioned
    # writes emit tasks × buckets small files (SCALE.md failure mode 8).
    (codes.repartition(F.col("bucket")).write.partitionBy("bucket")
     .parquet(os.path.join(tmp, "codes")))
    meta = {"id_col": id_col, "vec_col": vec_col, "m": int(m),
            "appended_shards": 0, "generation": int(generation)}
    # The manifest: every committed code file, sharded into per-bucket
    # sidecars under tmp/manifests. Written into tmp BEFORE the swap,
    # so the new generation goes live with its file list in the same
    # atomic rename.
    _manifest_set(tmp, meta, sorted(_list_codes_files(tmp)))
    if sweep_grace_seconds:
        # Superseded-file retention window (VERDICT r9 item 5) — see
        # _sweep_uncommitted; carried across rebuild generations.
        meta["sweep_grace_seconds"] = float(sweep_grace_seconds)
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
    opq_iters: int = 0, sweep_grace_seconds: float = 0.0,
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
                   opq_iters=opq_iters,
                   sweep_grace_seconds=sweep_grace_seconds)


class RecallGateError(ValueError):
    """A rebuild's new generation regressed recall on the held-out
    query sample and the swap was refused — the live index is untouched
    (VERDICT r8 item 4: a retrain on a bad sample must not silently
    ship a worse generation)."""


def _exact_topk_ids(queries: DataFrame, corpus: DataFrame,
                    id_col: str, vec_col: str, k: int) -> DataFrame:
    """Exact squared-euclidean top-k (query_id, match_id) — the ground
    truth for the recall gate. Queries are few by the holdout contract,
    so the broadcast cross join is one corpus scan (the q95d ground-
    truth shape), run once per scheduled rebuild, not per search."""
    from pyspark.sql import Window

    from api_to_amt_data_lake_spark.operators.similarity import (
        sq_euclidean,
    )

    return (
        F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).alias("_qv")))
        .crossJoin(corpus.select(F.col(id_col).alias("match_id"),
                                 F.col(vec_col).alias("_cv")))
        .select("query_id", "match_id",
                sq_euclidean(F.col("_qv"), F.col("_cv")).alias("_d"))
        .withColumn("_rk", F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("_d").asc(), F.col("match_id").asc())))
        .filter(F.col("_rk") <= k).select("query_id", "match_id"))


def _holdout_recall(spark: SparkSession, root: str, queries: DataFrame,
                    exact: DataFrame, k: int, nprobe: int) -> float:
    got = ann_index_search(spark, root, queries, k=k, nprobe=nprobe) \
        .select("query_id", "match_id")
    denom = exact.count()
    return (got.join(exact, ["query_id", "match_id"]).count() / denom
            if denom else 1.0)


def _kept_generations(root: str) -> list[str]:
    """Kept prior-generation roots, oldest first."""
    d, base = os.path.split(root.rstrip(os.sep))
    pre = base + "._gen"
    return [os.path.join(d, n) for n in sorted(os.listdir(d or "."))
            if n.startswith(pre)]


def rollback_ann_index(index_root: str) -> int:
    """Restore the most recent KEPT generation (see `rebuild_ann_index
    (keep_generations=...)`) byte-identically — two renames, so every
    file keeps its inode. The rolled-back-from index is deleted (it is
    the regretted generation). Returns the restored generation number.
    Crash-safe via the same discipline as the save swap: a crash
    between the renames leaves `._old`, which `_repair_root` restores."""
    root = str(index_root)
    with _writer_lock(root):
        return _rollback_locked(root)


def _rollback_locked(root: str) -> int:
    _repair_root(root)
    kept = _kept_generations(root)
    if not kept:
        raise FileNotFoundError(
            f"no kept generations beside {root} — rebuild with "
            "keep_generations >= 1 to enable rollback")
    newest = kept[-1]
    old = root + "._old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(root):
        os.rename(root, old)
    os.rename(newest, root)
    shutil.rmtree(old, ignore_errors=True)
    return int(_read_meta(root).get("generation", 0))


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
    holdout_queries: DataFrame | None = None,
    min_recall_ratio: float = 0.95,
    gate_k: int = 10,
    gate_nprobe: int = 2,
    keep_generations: int = 0,
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

    Recall gate (VERDICT r8 item 4): pass `holdout_queries` (a small
    (id, vec) sample) and the candidate generation must reach
    `min_recall_ratio` x the live generation's recall@`gate_k` —
    measured against the EXACT top-k over the caller's corpus — before
    the swap commits; a degraded retrain (bad sample, wrong
    hyperparameters) raises `RecallGateError` and leaves the live index
    byte-identical. `keep_generations` parks the outgoing generation(s)
    beside the root so `rollback_ann_index` can restore the previous
    one byte-identically after a post-hoc regret.
    """
    root = str(index_root)
    with _writer_lock(root):
        return _rebuild_locked(
            spark, corpus, root, kc, coarse_iters, m, k, iters,
            sample_frac, holdout_queries, min_recall_ratio, gate_k,
            gate_nprobe, keep_generations)


def _rebuild_locked(
    spark, corpus, root, kc, coarse_iters, m, k, iters, sample_frac,
    holdout_queries, min_recall_ratio, gate_k, gate_nprobe,
    keep_generations,
) -> int:
    # Heal a crashed prior swap BEFORE reading meta/marker: started in
    # the crashed-swap state (no live root, complete ._tmp), a rebuild
    # would otherwise see no previous index at all — generation reset
    # to 1 and, worse, the replay marker silently dropped.
    _repair_root(root)
    prev_gen, prev_m, marker = 0, None, None
    prev_opq_iters = 0
    prev_grace = 0.0
    meta_path = os.path.join(root, _META)
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        prev_gen, prev_m = int(prev.get("generation", 0)), prev["m"]
        prev_opq_iters = int(prev.get("opq_iters", 0))
        prev_grace = float(prev.get("sweep_grace_seconds", 0.0))
        mk = os.path.join(root, "_last_batch")
        if os.path.isfile(mk):
            with open(mk) as f:
                marker = f.read()
    id_col, vec_col = _corpus_cols(corpus, root)
    m = m if m is not None else (prev_m if prev_m is not None else 2)
    # The recall gate's ground truth must see the ORIGINAL vectors: the
    # OPQ path below rotates `corpus` into the index space, and while
    # the rotation is orthonormal (distance-preserving), the holdout
    # queries arrive unrotated — `ann_index_search` rotates them itself.
    corpus_raw = corpus
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
    extra = None if marker is None else {"_last_batch": marker}
    rot_l = None if rotation is None else rotation.tolist()
    # The new generation materializes COMPLETELY under a candidate
    # sibling first, replay marker inside — a crash mid-rebuild can
    # never leave a live index without its marker (which would reset
    # replay protection and re-append batches the rebuilt corpus
    # already contains), and a candidate that never passes the gate is
    # plain debris no reader or repair ever promotes.
    cand = root + "._cand"
    shutil.rmtree(cand, ignore_errors=True)
    save_ann_index(cand, coarse, book, codes, id_col, vec_col, m,
                   generation=gen, extra_files=extra, rotation=rot_l,
                   opq_iters=prev_opq_iters,
                   sweep_grace_seconds=prev_grace)
    # Recall gate (VERDICT r8 item 4): a retrain on a bad sample must
    # not silently ship a worse generation. Measured BEFORE anything
    # goes live: candidate recall@gate_k on the held-out queries —
    # against the exact top-k over the caller's corpus — must reach
    # min_recall_ratio of the LIVE generation's recall, else the
    # candidate is discarded and the live index stays byte-identical.
    if holdout_queries is not None and prev_m is None:
        # ADVICE r9: the caller asked for gating but there is no live
        # generation to measure the ratio against — say so instead of
        # silently promoting a possibly-degenerate first build.
        import warnings
        warnings.warn(
            "rebuild_ann_index: holdout_queries provided but no "
            "previous generation exists — the recall gate needs a live "
            "baseline, so this first generation is promoted UNGATED; "
            "validate it afterwards (ann_index_search vs exact top-k) "
            "or build it with build_ann_index and gate the next "
            "rebuild", stacklevel=3)
    if holdout_queries is not None and prev_m is not None:
        # Unconditional localCheckpoint is deliberate (VERDICT r9
        # item 2): gate-scoped — the exact top-k over the holdout is
        # consumed twice within this rebuild call; an executor loss
        # fails the (retryable) rebuild, the live index untouched.
        exact = _exact_topk_ids(holdout_queries, corpus_raw, id_col,
                                vec_col, gate_k).localCheckpoint()
        r_old = _holdout_recall(spark, root, holdout_queries, exact,
                                gate_k, gate_nprobe)
        r_new = _holdout_recall(spark, cand, holdout_queries, exact,
                                gate_k, gate_nprobe)
        if r_new < r_old * min_recall_ratio:
            shutil.rmtree(cand, ignore_errors=True)
            raise RecallGateError(
                f"rebuild refused: candidate recall@{gate_k} "
                f"{r_new:.4f} < {min_recall_ratio} x live generation's "
                f"{r_old:.4f} on {holdout_queries.count()} held-out "
                "queries; live index untouched")
    # Promote with the save-swap discipline; `keep_generations` parks
    # the outgoing generation at `<root>._gen<NNNN>` instead of deleting
    # it, so `rollback_ann_index` can restore it byte-identically.
    tmp, old_dir = root + "._tmp", root + "._old"
    for leftover in (tmp, old_dir):
        shutil.rmtree(leftover, ignore_errors=True)
    os.rename(cand, tmp)
    if os.path.isdir(root):
        if keep_generations > 0:
            park = root + f"._gen{prev_gen:04d}"
            shutil.rmtree(park, ignore_errors=True)
            os.rename(root, park)
        else:
            os.rename(root, old_dir)
    try:
        os.rename(tmp, root)
    except OSError:
        # A racing reader's _repair_root may have promoted tmp already.
        if not (os.path.isdir(root)
                and os.path.isfile(os.path.join(root, _META))):
            raise
    shutil.rmtree(old_dir, ignore_errors=True)
    kept = _kept_generations(root)
    for g in kept[:max(0, len(kept) - keep_generations)]:
        shutil.rmtree(g, ignore_errors=True)
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


def _read_model_rows(path: str):
    """Driver-side read of a persisted MODEL dir (kc×dim coarse table /
    m×k codebook — one small parquet file from `_write_model_parquet`,
    or a handful from a legacy Spark write) into pyspark Rows, or None
    when anything about the layout is unexpected. Model-sized work by
    construction — the symmetric read of the driver-side model write
    (round 12, guide §1.2): consumers that fold the model into scan
    expressions (`ivfpq_topk`, `ivf_probe_buckets`, `encode_shard`'s
    residual/code folds) get their rows without a Spark job per
    consumer."""
    try:
        import pyarrow.parquet as pq
        from pyspark.sql import Row

        files = [os.path.join(path, f) for f in sorted(os.listdir(path))
                 if f.endswith(".parquet") and not f.startswith((".", "_"))]
        if not files:
            return None
        tables = [pq.read_table(f) for f in files]
        tbl = tables[0] if len(tables) == 1 else \
            tables[0].from_batches(
                [b for t in tables for b in t.to_batches()],
                schema=tables[0].schema)
        cols = tbl.column_names
        make = Row(*cols)
        return [make(*[d[c] for c in cols]) for d in tbl.to_pylist()]
    except Exception:
        return None  # fall back to collect-on-demand


def _load_models(
    spark: SparkSession, root: str,
) -> tuple[DataFrame, DataFrame, dict]:
    """(coarse, book, meta) only — no codes frame. The append path and
    the search path's probe stage use this: constructing the codes
    DataFrame builds a driver-side file index over every committed
    code file (at 100 TB: a listing of the whole index), while the
    models are two one-file broadcast-sized parquet reads. Both crash
    windows heal here, same as the full load.

    Round 12: the model ROWS are additionally read driver-side via
    pyarrow and stashed on the returned frames (`_model_rows`, the
    trainer-output contract), so every folded consumer — append's
    encode, search's probe and ADC stages — skips its per-consumer
    collect job; the frames themselves stay lazy parquet reads for
    any caller that wants the DataFrame."""
    _repair_root(root)
    _repair_compaction(root)
    meta = _read_meta(root)
    coarse = spark.read.parquet(os.path.join(root, "coarse"))
    book = spark.read.parquet(os.path.join(root, "book"))
    coarse_rows = _read_model_rows(os.path.join(root, "coarse"))
    if coarse_rows is not None:
        coarse._model_rows = coarse_rows
    book_rows = _read_model_rows(os.path.join(root, "book"))
    if book_rows is not None:
        book._model_rows = book_rows
    return coarse, book, meta


def _load_codes(spark: SparkSession, root: str, meta: dict,
                buckets: list | None = None) -> DataFrame:
    """The committed codes frame, optionally restricted to `buckets`
    AT LISTING TIME: only the named buckets' manifest entries are
    handed to the reader, so the driver's file index — and the footer
    work behind it — is bounded by the probed buckets, not the index
    (guide §6: at scale the search should list nprobe/kc of the files,
    not list everything and prune later). Callers that pass `buckets`
    still apply their own row-level bucket filter; with at least one
    committed file the schema is preserved even when no probed bucket
    has files (read one file, filter to empty). Legacy indexes without
    a manifest fall back to the directory read (then the caller's
    filter prunes hive partitions instead)."""
    codes_dir = os.path.join(root, "codes")
    manifest = _manifest_get(root, meta)
    if not manifest:
        return spark.read.parquet(codes_dir)
    files = manifest
    if buckets is not None:
        want = {f"bucket={b}" for b in buckets}
        kept = [rel for rel in manifest
                if rel.split("/", 1)[0] in want]
        # No committed file in any probed bucket: keep one file so the
        # frame has the index's schema; the caller's bucket filter
        # makes it empty.
        files = kept or manifest[:1]
    return (spark.read.option("basePath", codes_dir)
            .parquet(*[os.path.join(codes_dir, rel) for rel in files]))


def load_ann_index(
    spark: SparkSession, index_root: str,
) -> tuple[DataFrame, DataFrame, DataFrame, dict]:
    """(coarse, book, codes, meta) from a persisted index. The codes
    frame keeps its hive bucket partitioning, so `bucket` filters prune
    at the file level. Both crash windows heal here — the save swap's
    rename gap and (legacy indexes) compaction's per-bucket rename gap —
    so a search-only deployment never silently reads a partial index.

    Reader atomicity: the codes frame is built from the MANIFEST
    (`meta["codes_files"]`, read with `basePath` so partition pruning
    survives), never from a directory listing — files an in-flight
    append has landed but not committed are invisible, so every search
    sees the index at a whole number of committed shards. Legacy
    indexes without a manifest fall back to the directory read."""
    root = str(index_root)
    coarse, book, meta = _load_models(spark, root)
    return coarse, book, _load_codes(spark, root, meta), meta


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
    """COMMITTED parquet file count per code bucket — the compaction
    trigger's input (one JSON read, no Spark job). Counts come from the
    manifest (what readers actually scan), not the directory: staged or
    superseded files awaiting the sweep don't inflate the trigger.
    Legacy indexes without a manifest fall back to the listing."""
    root = str(index_root)
    meta_path = os.path.join(root, _META)
    out: dict[int, int] = {}
    manifest = None
    if os.path.isfile(meta_path):
        manifest = _manifest_get(root, _read_meta(root))
    if manifest is not None:
        for rel in manifest:
            b = int(rel.split("/", 1)[0].split("=", 1)[1])
            out[b] = out.get(b, 0) + 1
        return out
    codes = os.path.join(root, "codes")
    for d in os.listdir(codes):
        if d.startswith("bucket="):
            b = int(d.split("=", 1)[1])
            out[b] = sum(1 for f in os.listdir(os.path.join(codes, d))
                         if f.endswith(".parquet"))
    return out


def compact_index_buckets(
    spark: SparkSession, index_root: str, max_files: int = 16,
    target_bytes: int = 128 * 1024 * 1024,
    _locked: bool = False,
) -> list[int]:
    """Rewrite code buckets whose parquet file count exceeds
    `max_files` down to ~`target_bytes` files — the lifecycle bound on
    the add-only append (VERDICT r7 missing item 2: after thousands of
    micro-batches a hot bucket accumulates thousands of small files,
    and open()-per-file starts to dominate the probed-bucket scan).

    Content-preserving and MANIFEST-COMMITTED per bucket (VERDICT r8
    item 1): the compacted replacement files are written under a hidden
    tmp sibling (invisible — readers resolve files only through the
    manifest), moved into the live bucket dir under their own unique
    part names (still uncommitted), and then the bucket's manifest
    entries are swapped for the new ones in ONE atomic meta replace — a
    concurrent search sees the bucket pre- or post-compaction, never a
    mix and never a missing bucket. The superseded files are NOT deleted
    here: they stay on disk as uncommitted debris until the NEXT writer
    operation's sweep, so a reader that loaded the previous manifest
    keeps a whole writer-cycle grace window (Iceberg's snapshot-then-
    expire discipline, scaled down to one JSON manifest). Only a reader
    more than two writer cycles stale can fail transiently with
    FileNotFound and should simply retry — never corruption, every
    committed manifest is complete. Only the oversized buckets are read
    or written — cost tracks the backlog, not the index. Returns the
    bucket ids compacted."""
    if not _locked:
        with _writer_lock(index_root):
            return compact_index_buckets(spark, index_root, max_files,
                                         target_bytes, _locked=True)
    root = str(index_root)
    codes = os.path.join(root, "codes")
    _repair_compaction(root, destructive=True)  # legacy crash debris
    meta = _read_meta(root)
    _ensure_manifest(root, meta)  # legacy index: snapshot dir state
    _sweep_uncommitted(root, meta)

    committed = _manifest_get(root, meta) or []
    per_bucket: dict[int, list[str]] = {}
    for rel in committed:
        b = int(rel.split("/", 1)[0].split("=", 1)[1])
        per_bucket.setdefault(b, []).append(rel)

    compacted: list[int] = []
    for b, rels in sorted(per_bucket.items()):
        if len(rels) <= max_files:
            continue
        live = os.path.join(codes, f"bucket={b}")
        paths = [os.path.join(codes, rel) for rel in rels]
        nbytes = sum(os.stat(pth).st_size for pth in paths)
        n_out = max(1, -(-nbytes // target_bytes))
        tmp = os.path.join(root, f".compact_tmp_bucket={b}")
        shutil.rmtree(tmp, ignore_errors=True)
        spark.read.parquet(*paths).coalesce(n_out).write.parquet(tmp)
        # Stage: move the replacement files into the live dir. Spark
        # part names embed a per-write UUID, so they cannot collide
        # with the committed ones; until the meta replace below they
        # are invisible to every reader.
        staged: list[str] = []
        for f in os.listdir(tmp):
            if f.endswith(".parquet") and not f.startswith("."):
                os.rename(os.path.join(tmp, f), os.path.join(live, f))
                crc = os.path.join(tmp, f".{f}.crc")
                if os.path.isfile(crc):
                    os.rename(crc, os.path.join(live, f".{f}.crc"))
                staged.append(f"bucket={b}/{f}")
        shutil.rmtree(tmp, ignore_errors=True)
        # Commit: swap this bucket's manifest entries — a new immutable
        # sidecar for the bucket, published by one atomic meta replace.
        # Crash before the replace → staged files + sidecar are swept
        # by the next writer op; crash after → the superseded ones are
        # retained for the index's sweep grace window, then swept.
        _mark_superseded(meta, rels)
        committed = sorted((set(committed) - set(rels)) | set(staged))
        _manifest_set(root, meta, committed)
        _write_meta_atomic(root, meta)
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
    instead of growing one file per micro-batch forever.

    Reader atomicity (VERDICT r8 item 1): the shard's files are STAGED
    first (`_append_stage` — on disk but absent from the manifest, so
    invisible to every concurrent search) and then COMMITTED by one
    atomic meta replace (`_append_commit`). A search racing the append
    sees the pre-append index until the commit instant and the complete
    post-append index after it — never a partially-visible shard. A
    crash between stage and commit leaves debris the next writer
    operation sweeps; nothing a reader can ever observe."""
    with _writer_lock(index_root):
        meta, new_files = _append_stage(spark, index_root, shard)
        _append_commit(index_root, meta, new_files)
        if compact_threshold is not None:
            compact_index_buckets(spark, index_root,
                                  max_files=compact_threshold,
                                  _locked=True)


def _append_stage(
    spark: SparkSession, index_root: str, shard: DataFrame,
) -> tuple[dict, set[str]]:
    """Phase 1 of an append: encode the shard against the loaded models
    and land its code files on disk WITHOUT committing them. Returns
    (meta, staged relative paths). Exposed as a seam so tests can
    interleave a reader between stage and commit."""
    root = str(index_root)
    # Models only (round 11): the encode needs coarse/book/meta, and
    # building the unused codes frame cost a driver-side file index
    # over the whole committed file list per append.
    coarse, book, meta = _load_models(spark, root)
    _ensure_manifest(root, meta)   # legacy index: snapshot dir state
    _sweep_uncommitted(root, meta)  # crash debris / superseded files
    shard = _apply_rotation(shard, meta)  # OPQ indexes store rotated codes
    new_codes = encode_shard(shard, coarse, book,
                             meta["id_col"], meta["vec_col"])
    # Cluster the increment by bucket before the partitioned append —
    # the exchange carries only the shard's code rows, and each append
    # adds ~one file per touched bucket instead of tasks × buckets.
    (new_codes.repartition(F.col("bucket"))
     .write.mode("append").partitionBy("bucket")
     .parquet(os.path.join(root, "codes")))
    # Post-sweep, every on-disk file not in the manifest is either ours
    # or a grace-retained superseded file (tracked — never re-adopted).
    new_files = (_list_codes_files(root)
                 - set(_manifest_get(root, meta) or ())
                 - set(meta.get("superseded", {})))
    return meta, new_files


def _append_commit(index_root: str, meta: dict,
                   new_files: set[str]) -> None:
    """Phase 2 of an append: fold the staged files into the manifest
    (new sidecars for the touched buckets only) and atomically replace
    meta.json — the instant the shard becomes visible to readers, as a
    whole."""
    root = str(index_root)
    _manifest_set(root, meta,
                  sorted(set(_manifest_get(root, meta) or ())
                         | new_files))
    meta["appended_shards"] = int(meta.get("appended_shards", 0)) + 1
    _write_meta_atomic(root, meta)


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

    Concurrency contract: the search resolves code files through the
    COMMITTED manifest captured at load time, so a racing
    `ann_index_append` is invisible until its atomic commit and every
    result equals the index at some whole number of committed shards
    (VERDICT r8 item 1). A search can fail TRANSIENTLY with
    FileNotFound only when its manifest is more than one writer cycle
    stale — the files a committed compaction superseded survive until
    the NEXT writer operation's sweep, so the in-flight window is
    covered; a straggler should simply retry. Never corruption or data
    loss: every committed manifest is complete."""
    root = str(index_root)
    coarse, book, meta = _load_models(spark, root)
    id_col, vec_col, m = meta["id_col"], meta["vec_col"], meta["m"]
    # OPQ indexes live in the rotated space; orthonormal R preserves
    # euclidean distances, so rotating the (few) queries is the entire
    # search-side cost of OPQ.
    queries = _apply_rotation(queries, meta)
    if prune:
        # Probe FIRST, then build the codes frame from only the probed
        # buckets' manifest entries (round 11, guide §6): the driver's
        # file listing is bounded by nprobe × |queries| buckets instead
        # of the whole committed file list. The row-level bucket filter
        # stays — it is what prunes hive partitions on legacy
        # (manifest-less) indexes and makes the probed-empty edge case
        # return zero rows.
        probed = [
            r["bucket"]
            for r in ivf_probe_buckets(queries, coarse, id_col, vec_col,
                                       nprobe)
            .select("bucket").distinct().collect()
        ]
        codes = _load_codes(spark, root, meta, buckets=probed) \
            .filter(F.col("bucket").isin(probed))
    else:
        codes = _load_codes(spark, root, meta)
    return ivfpq_topk(queries, coarse, book, codes, id_col, vec_col,
                      m=m, k=k, nprobe=nprobe)
