"""Persisted IVFPQ ANN index: save/load/append/search contracts.

VERDICT r6 item 1 — the index must (a) round-trip through disk, (b)
append a shard by folded-encoding ONLY the increment against the frozen
models (no retrain, no rewrite of existing code files), and (c) search
from the loaded index exactly as `ivfpq_topk` would over the union
corpus encoded in one lineage."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators.sampling import _M32, hash_bucket
from api_to_amt_data_lake_spark.operators.similarity import (
    ivfpq_fit,
    ivfpq_topk,
)
from api_to_amt_data_lake_spark.sources.ann_index import (
    ann_index_append,
    ann_index_search,
    build_ann_index,
    encode_shard,
    load_ann_index,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet")) \
        .select("vec_id", "embedding")


def _halves(spark):
    e = _emb(spark)
    half = hash_bucket(F.col("vec_id").cast("long")) < int(0.5 * _M32)
    return e, e.filter(half), e.filter(~half)


@pytest.fixture(scope="module")
def index_root(spark, tmp_path_factory):
    """Models trained on the base half, BOTH halves' codes present
    (shard appended) — the state every test here assumes, built in the
    fixture so tests stay order-independent."""
    root = str(tmp_path_factory.mktemp("ann") / "idx")
    _, base, shard = _halves(spark)
    build_ann_index(base, root, "vec_id", "embedding", kc=4,
                    coarse_iters=2, m=2, k=4, iters=2)
    ann_index_append(spark, root, shard)
    return root


def _code_files(root: str) -> dict[str, tuple[int, float, int]]:
    out = {}
    for dirpath, _, names in os.walk(os.path.join(root, "codes")):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(dirpath, n)
                st = os.stat(p)
                out[p] = (st.st_size, st.st_mtime, st.st_ino)
    return out


def test_append_adds_files_without_touching_existing(spark, tmp_path):
    # Builds its OWN base-only index: this test audits the append
    # itself, so it must not share the already-appended module fixture.
    root = str(tmp_path / "idx")
    e, base, shard = _halves(spark)
    build_ann_index(base, root, "vec_id", "embedding", kc=4,
                    coarse_iters=2, m=2, k=4, iters=2)
    before = _code_files(root)
    n_before = spark.read.parquet(os.path.join(root, "codes")).count()
    ann_index_append(spark, root, shard)
    after = _code_files(root)
    # Every pre-existing file survives byte-identical (same inode, size,
    # mtime) — the append is add-only, the Delta-MERGE shape in parquet.
    for p, sig in before.items():
        assert p in after and after[p] == sig, f"rewrote {p}"
    assert len(after) > len(before)
    n_after = spark.read.parquet(os.path.join(root, "codes")).count()
    # m=2 code rows per appended vector.
    assert n_after - n_before == shard.count() * 2


def test_loaded_appended_search_matches_union_lineage(spark, index_root):
    """Search over the loaded+appended index == ivfpq_topk over the
    union corpus with the SAME trained models (sample_frac=0.5 trains
    on exactly the base half)."""
    e, base, shard = _halves(spark)
    coarse, book, codes = ivfpq_fit(
        e, "vec_id", "embedding", kc=4, coarse_iters=2, m=2, k=4,
        iters=2, sample_frac=0.5)
    q = e.filter(F.col("vec_id") < 5)
    want = sorted(
        (r["query_id"], r["match_id"], r["adc_dist"], r["rank"])
        for r in ivfpq_topk(q, coarse, book, codes, "vec_id",
                            "embedding", m=2, k=3, nprobe=1).collect())
    got = sorted(
        (r["query_id"], r["match_id"], r["adc_dist"], r["rank"])
        for r in ann_index_search(spark, index_root, q, k=3,
                                  nprobe=1).collect())
    assert got == want


def test_pruned_search_matches_unpruned(spark, index_root):
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 5)
    full = sorted(map(tuple, ann_index_search(
        spark, index_root, q, k=3, nprobe=2, prune=False).collect()))
    pruned = sorted(map(tuple, ann_index_search(
        spark, index_root, q, k=3, nprobe=2, prune=True).collect()))
    assert pruned == full


def test_append_encode_plan_is_pure_scan(spark, index_root):
    """The append encodes ONLY the increment at scan speed: models fold
    into the projection — zero Exchange, zero join in the executed
    plan, and the scan reads the shard, not the index."""
    _, _, shard = _halves(spark)
    coarse, book, _, meta = load_ann_index(spark, index_root)
    frame = encode_shard(shard, coarse, book, "vec_id", "embedding")
    plan = frame._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_meta_tracks_appends(spark, index_root):
    *_, meta = load_ann_index(spark, index_root)
    assert meta["appended_shards"] >= 1
    assert meta["m"] == 2 and meta["id_col"] == "vec_id"
