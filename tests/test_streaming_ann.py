"""Streaming ANN index maintenance: stream-appended == batch-built."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators.sampling import _M32, hash_bucket
from api_to_amt_data_lake_spark.sources.ann_index import (
    ann_index_search,
    build_ann_index,
)
from api_to_amt_data_lake_spark.streaming.ann import (
    dedupe_codes,
    fold_ann_batch,
    last_applied_batch,
    stream_ann_index,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet")) \
        .select("vec_id", "embedding")


def test_stream_appended_index_matches_batch(spark, tmp_path):
    """Build the models on the base half; stream the other half in as
    two micro-batch files; search results must equal the index where
    the same shard was appended in one batch call."""
    e = _emb(spark)
    half = hash_bucket(F.col("vec_id").cast("long")) < int(0.5 * _M32)
    base, shard = e.filter(half), e.filter(~half)

    batch_root = str(tmp_path / "batch_idx")
    build_ann_index(base, batch_root, "vec_id", "embedding", kc=4,
                    coarse_iters=2, m=2, k=4, iters=2)
    stream_root = str(tmp_path / "stream_idx")
    build_ann_index(base, stream_root, "vec_id", "embedding", kc=4,
                    coarse_iters=2, m=2, k=4, iters=2)

    from api_to_amt_data_lake_spark.sources.ann_index import (
        ann_index_append,
    )
    ann_index_append(spark, batch_root, shard)

    # Stream the shard as two files -> two micro-batches.
    src = tmp_path / "src"
    src.mkdir()
    mid = F.pmod(F.xxhash64("vec_id"), F.lit(2)) == 0
    shard.filter(mid).coalesce(1).write.parquet(str(src / "f1"))
    shard.filter(~mid).coalesce(1).write.parquet(str(src / "f2"))
    stream = (spark.readStream.schema(shard.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src / "*")))
    q = stream_ann_index(stream, stream_root,
                         checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    probes = e.filter(F.col("vec_id") < 5)
    want = sorted(map(tuple, ann_index_search(
        spark, batch_root, probes, k=3, nprobe=2).collect()))
    got = sorted(map(tuple, ann_index_search(
        spark, stream_root, probes, k=3, nprobe=2).collect()))
    assert got == want and len(got) > 0

    # Replay: same batch id is skipped (no duplicate codes).
    last = last_applied_batch(stream_root)
    assert last >= 1
    n_before = spark.read.parquet(
        os.path.join(stream_root, "codes")).count()
    assert fold_ann_batch(spark, shard, last, stream_root) is False
    assert spark.read.parquet(
        os.path.join(stream_root, "codes")).count() == n_before

    # Dirty-append recovery: force a duplicate append, then dedupe.
    assert fold_ann_batch(spark, shard.limit(5), last + 1, stream_root)
    removed = dedupe_codes(spark, stream_root)
    assert removed == 5 * 2  # m=2 code rows per duplicated vector
    clean = sorted(map(tuple, ann_index_search(
        spark, stream_root, probes, k=3, nprobe=2).collect()))
    assert clean == want


def test_search_mid_stream_sees_exactly_committed_batches(
        spark, tmp_path):
    """VERDICT r7 item 6 — read-after-append consistency: a search
    issued after batch k commits must equal a search over an index
    where exactly batches 0..k were appended in one-shot batch calls —
    no missing rows (the append is visible the moment `fold_ann_batch`
    returns) and no extra rows (uncommitted batches are invisible)."""
    import shutil

    from api_to_amt_data_lake_spark.sources.ann_index import (
        ann_index_append,
    )

    e = _emb(spark)
    half = hash_bucket(F.col("vec_id").cast("long")) < int(0.5 * _M32)
    base, shard = e.filter(half), e.filter(~half)
    live = str(tmp_path / "live")
    build_ann_index(base, live, "vec_id", "embedding", kc=4,
                    coarse_iters=2, m=2, k=4, iters=2)
    ref_base = str(tmp_path / "ref_base")
    shutil.copytree(live, ref_base)  # same frozen models, bit-for-bit

    probes = e.filter(F.col("vec_id") < 5)
    batches = [
        shard.filter(F.pmod(F.xxhash64("vec_id"), F.lit(3)) == i)
        for i in range(3)
    ]
    for k, b in enumerate(batches):
        assert fold_ann_batch(spark, b, k, live)
        # Reference: a fresh copy of the BASE index with batches 0..k
        # appended one-shot.
        ref = str(tmp_path / f"ref_{k}")
        shutil.copytree(ref_base, ref)
        for bb in batches[: k + 1]:
            ann_index_append(spark, ref, bb)
        got = sorted(map(tuple, ann_index_search(
            spark, live, probes, k=3, nprobe=2).collect()))
        want = sorted(map(tuple, ann_index_search(
            spark, ref, probes, k=3, nprobe=2).collect()))
        assert got == want and len(got) > 0, f"batch {k}"
        assert last_applied_batch(live) == k


def test_sustained_folds_keep_file_counts_bounded(spark, tmp_path):
    """VERDICT r7 item 4 — the compaction cadence: ~50 micro-batches
    through `fold_ann_batch(compact_threshold=...)` must keep every
    bucket's parquet file count bounded by the threshold while the code
    rows stay exactly the union of all folded batches.

    VERDICT r9 item 5 — superseded-file retention: the index is built
    with a retention window (`sweep_grace_seconds`) and a CONCURRENT
    reader thread searches throughout the 50 append+compact cycles —
    zero transient failures allowed: compaction supersedes files but
    the sweep retains them for the grace window, so even a reader
    holding a many-cycles-stale manifest never hits FileNotFound."""
    import threading

    from api_to_amt_data_lake_spark.sources.ann_index import (
        _list_codes_files,
        _read_meta,
        bucket_file_counts,
        committed_files,
        expire_superseded,
    )

    e = _emb(spark)
    half = hash_bucket(F.col("vec_id").cast("long")) < int(0.5 * _M32)
    base, shard = e.filter(half), e.filter(~half)
    root = str(tmp_path / "idx")
    build_ann_index(base, root, "vec_id", "embedding", kc=4,
                    coarse_iters=2, m=2, k=4, iters=2,
                    sweep_grace_seconds=3600.0)
    n_batches = 50
    parts = shard.withColumn(
        "_p", F.pmod(F.xxhash64("vec_id"), F.lit(n_batches)))
    parts.localCheckpoint()  # one plan, 50 cheap filters

    probes = e.filter(F.col("vec_id") < 3).localCheckpoint()
    stop = threading.Event()
    reader_failures: list[BaseException] = []
    reader_rounds = [0]

    def read_loop():
        while not stop.is_set():
            try:
                n = ann_index_search(spark, root, probes, k=2,
                                     nprobe=2).count()
                assert n > 0
                reader_rounds[0] += 1
            except BaseException as exc:  # noqa: BLE001 — recorded
                reader_failures.append(exc)
                return

    reader = threading.Thread(target=read_loop, daemon=True)
    reader.start()
    try:
        peak = 0
        for i in range(n_batches):
            fold_ann_batch(spark, parts.filter(
                F.col("_p") == i).drop("_p"), i, root,
                compact_threshold=6)
            counts = bucket_file_counts(root)
            peak = max(peak, max(counts.values()))
    finally:
        stop.set()
        reader.join(timeout=120)
    assert not reader_failures, reader_failures[0]
    assert reader_rounds[0] > 0  # the reader genuinely interleaved
    # Bounded at every step: an append adds at most one file per bucket
    # above the compacted floor, and any bucket past the threshold is
    # rewritten before the fold returns.
    assert peak <= 6, peak
    # Content through the COMMITTED manifest (what searches read): the
    # on-disk directory legitimately holds grace-retained superseded
    # files until expiry.
    from api_to_amt_data_lake_spark.sources.ann_index import (
        load_ann_index,
    )
    *_, codes, _meta = load_ann_index(spark, root)
    assert codes.count() == e.count() * 2  # m=2 rows per vector
    assert codes.select("vec_id").distinct().count() == e.count()
    # Retention really held files back; force-expire reclaims them and
    # leaves disk == committed manifest.
    meta = _read_meta(root)
    assert meta.get("superseded"), "compactions should have tracked "\
        "superseded files under the grace window"
    expired = expire_superseded(root, min_age_seconds=0.0)
    assert expired
    assert _list_codes_files(root) == committed_files(root)
    assert ann_index_search(spark, root, probes, k=2,
                            nprobe=2).count() > 0


def test_rebuild_between_stream_folds_preserves_exactness(
        spark, tmp_path):
    """VERDICT r8 item 2 — the generation swap under LIVE folds: folds
    0..k, then `rebuild_ann_index` on the committed corpus, then folds
    k+1..n. The final index must equal a batch-built one over all n
    batches: the replay marker rides across the swap (replaying batches
    0..k after the rebuild is a no-op), nothing is re-appended (exact
    row counts — the rebuilt corpus already contains batches 0..k) and
    nothing is dropped (every id present once)."""
    from api_to_amt_data_lake_spark.sources.ann_index import (
        ann_index_append,
        load_ann_index,
        rebuild_ann_index,
    )

    e = _emb(spark)
    half = hash_bucket(F.col("vec_id").cast("long")) < int(0.5 * _M32)
    base, shard = e.filter(half), e.filter(~half)
    batches = [
        shard.filter(F.pmod(F.xxhash64("vec_id"), F.lit(4)) == i)
        for i in range(4)
    ]
    live = str(tmp_path / "live")
    build_ann_index(base, live, "vec_id", "embedding", kc=4,
                    coarse_iters=2, m=2, k=4, iters=2)

    # Folds 0..1 — the stream is live.
    for k, b in enumerate(batches[:2]):
        assert fold_ann_batch(spark, b, k, live)
    assert last_applied_batch(live) == 1

    # Mid-stream rebuild on the COMMITTED corpus (read-your-own-state:
    # everything folded so far), exactly the drift-remedy deployment.
    committed = base.unionByName(batches[0]).unionByName(batches[1])
    gen = rebuild_ann_index(spark, committed, live, kc=4,
                            coarse_iters=2, k=4, iters=2)
    assert gen == 1
    # The marker rode the swap: the stream's position is intact…
    assert last_applied_batch(live) == 1
    # …so replaying the pre-rebuild batches is a no-op, not a re-append.
    for k, b in enumerate(batches[:2]):
        assert fold_ann_batch(spark, b, k, live) is False

    # Folds 2..3 — the stream continues against the new generation.
    for k, b in enumerate(batches[2:], start=2):
        assert fold_ann_batch(spark, b, k, live)
    assert last_applied_batch(live) == 3

    # Batch reference: a fresh build on the same committed corpus (the
    # rebuild parity test pins rebuild == fresh build) + one-shot
    # appends of the post-rebuild batches.
    ref = str(tmp_path / "ref")
    build_ann_index(committed, ref, "vec_id", "embedding", kc=4,
                    coarse_iters=2, m=2, k=4, iters=2)
    for b in batches[2:]:
        ann_index_append(spark, ref, b)

    probes = e.filter(F.col("vec_id") < 5)
    got = sorted(map(tuple, ann_index_search(
        spark, live, probes, k=3, nprobe=2).collect()))
    want = sorted(map(tuple, ann_index_search(
        spark, ref, probes, k=3, nprobe=2).collect()))
    assert got == want and len(got) > 0

    # Exact content: nothing re-appended, nothing dropped.
    *_, codes, meta = load_ann_index(spark, live)
    n_ids = e.count()
    assert codes.count() == n_ids * meta["m"]
    assert codes.select("vec_id").distinct().count() == n_ids


def test_dedupe_is_manifest_committed_and_crash_safe(
        spark, tmp_path, monkeypatch):
    """ADVICE r9 (high): dedupe must follow stage→commit→sweep — the
    committed manifest must never reference deleted files, a crash
    before the commit must be a pure no-op (the pre-dedupe index stays
    fully live and loadable), and the superseded files must survive as
    uncommitted debris until the NEXT writer operation's sweep so a
    reader holding the previous manifest keeps its grace window."""
    from api_to_amt_data_lake_spark.sources import ann_index as ai
    from api_to_amt_data_lake_spark.sources.ann_index import (
        _list_codes_files,
        _read_meta,
        ann_index_append,
        committed_files,
        compact_index_buckets,
    )

    e = _emb(spark)
    half = hash_bucket(F.col("vec_id").cast("long")) < int(0.5 * _M32)
    base, shard = e.filter(half), e.filter(~half)
    root = str(tmp_path / "idx")
    build_ann_index(base, root, "vec_id", "embedding", kc=4,
                    coarse_iters=2, m=2, k=4, iters=2)
    ann_index_append(spark, root, shard)
    # Dirty append: duplicate 5 vectors (the crash-between-append-and-
    # marker exposure dedupe exists to repair).
    ann_index_append(spark, root, shard.limit(5))

    probes = e.filter(F.col("vec_id") < 5)
    dirty = sorted(map(tuple, ann_index_search(
        spark, root, probes, k=3, nprobe=2).collect()))
    pre_manifest = committed_files(root)

    # Crash injection: die at the commit instant. The index must stay
    # exactly the pre-dedupe index — same manifest, every file on disk.
    real_commit = ai._write_meta_atomic

    def boom(r, m):
        raise OSError("injected crash at commit")

    monkeypatch.setattr(ai, "_write_meta_atomic", boom)
    import pytest
    with pytest.raises(OSError, match="injected"):
        dedupe_codes(spark, root)
    monkeypatch.setattr(ai, "_write_meta_atomic", real_commit)

    assert committed_files(root) == pre_manifest
    on_disk = _list_codes_files(root)
    assert pre_manifest <= on_disk  # every committed file still live
    crashed = sorted(map(tuple, ann_index_search(
        spark, root, probes, k=3, nprobe=2).collect()))
    assert crashed == dirty  # pre-dedupe index fully intact

    # Real dedupe: committed manifest references only on-disk files,
    # superseded files linger as debris (reader grace window).
    removed = dedupe_codes(spark, root)
    assert removed == 5 * 2  # m=2 code rows per duplicated vector
    committed = committed_files(root)
    on_disk2 = _list_codes_files(root)
    assert committed <= on_disk2
    assert pre_manifest & on_disk2  # old files NOT deleted at commit

    # Next writer op sweeps the superseded debris.
    compact_index_buckets(spark, root, max_files=10_000)
    on_disk3 = _list_codes_files(root)
    assert on_disk3 == committed_files(root)
    assert not (pre_manifest & on_disk3)

    clean = sorted(map(tuple, ann_index_search(
        spark, root, probes, k=3, nprobe=2).collect()))
    assert len(clean) > 0
