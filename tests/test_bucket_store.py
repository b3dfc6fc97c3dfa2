"""Bucketed MERGE-splice store (VERDICT r6 item 2).

Contracts: (1) bucketed streaming folds produce bit-identical state to
the full-rewrite path; (2) a fold rewrites ONLY the touched buckets —
untouched bucket files in the new version are the SAME inodes as the
previous version's (hard links, zero bytes rewritten); (3) the merge
plan reads only touched partitions and never exchanges the state on
the key (broadcast semi/anti on the batch's keys)."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from api_to_amt_data_lake_spark.sources.bucket_store import (
    bucket_col,
    fold_bucketed,
    read_current,
    splice_merge,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("state", T.StringType()),
    T.StructField("deleted", T.BooleanType()),
])
T1, T2, T3, T4 = (datetime(2024, 1, 1), datetime(2024, 2, 1),
                  datetime(2024, 3, 1), datetime(2024, 4, 1))
BATCHES = [
    [(k, T1, "A", False) for k in range(40)],
    [(1, T2, "B", False), (2, T3, "Y", False)],   # 2 keys change
    [(1, T3, None, True)],                        # tombstone key 1
    [(1, T4, "C", False), (41, T4, "N", False)],  # reopen + new key
]


def _hist_rows(spark, root, name):
    from api_to_amt_data_lake_spark.streaming.scd import read_history
    return {
        (r["k"], r["state"], r["valid_from"], r["valid_to"],
         r["is_current"])
        for r in read_history(spark, root, name).collect()}


def _fold_all(spark, root, name, n_buckets):
    from api_to_amt_data_lake_spark.streaming.scd import fold_scd2_batch
    for i, rows in enumerate(BATCHES):
        fold_scd2_batch(
            spark, spark.createDataFrame(rows, SCHEMA), i, root, name,
            "k", "ts", ["state"], tombstone_col="deleted",
            n_buckets=n_buckets)


def test_scd2_bucketed_matches_full_rewrite(spark, tmp_path):
    plain, buck = str(tmp_path / "plain"), str(tmp_path / "buck")
    _fold_all(spark, plain, "dim", None)
    _fold_all(spark, buck, "dim", 8)
    assert _hist_rows(spark, buck, "dim") == _hist_rows(spark, plain, "dim")


def _bucket_files(vdir: str) -> dict[str, dict[str, int]]:
    """{_bkt=b: {filename: inode}} for one version directory."""
    out: dict[str, dict[str, int]] = {}
    for d in os.listdir(vdir):
        if d.startswith("_bkt="):
            out[d] = {
                f: os.stat(os.path.join(vdir, d, f)).st_ino
                for f in os.listdir(os.path.join(vdir, d))
                if f.endswith(".parquet")}
    return out


def test_untouched_buckets_hard_linked(spark, tmp_path):
    """After a 2-key micro-batch, every bucket the batch does NOT touch
    must appear in the new version as hard links to the previous
    version's files — same inodes, zero bytes rewritten."""
    root = str(tmp_path / "b")
    from api_to_amt_data_lake_spark.streaming.scd import fold_scd2_batch
    n_buckets = 8
    fold_scd2_batch(spark, spark.createDataFrame(BATCHES[0], SCHEMA), 0,
                    root, "dim", "k", "ts", ["state"],
                    tombstone_col="deleted", n_buckets=n_buckets,
                    keep_versions=9)
    batch1 = spark.createDataFrame(BATCHES[1], SCHEMA)
    touched = {
        f"_bkt={r['_b']}" for r in batch1.select(
            bucket_col("k", n_buckets).alias("_b")).distinct().collect()}
    v0 = _bucket_files(os.path.join(root, "dim", "v0"))
    fold_scd2_batch(spark, batch1, 1, root, "dim", "k", "ts", ["state"],
                    tombstone_col="deleted", n_buckets=n_buckets,
                    keep_versions=9)
    v1 = _bucket_files(os.path.join(root, "dim", "v1"))
    untouched = set(v0) - touched
    assert untouched, "fixture must leave some buckets untouched"
    for d in untouched:
        assert v1[d] == v0[d], f"{d} was rewritten, not linked"
    for d in touched & set(v0):
        assert not (set(v1[d].values()) & set(v0[d].values())), \
            f"touched {d} must be fresh files"
    assert _hist_rows(spark, root, "dim") is not None


def test_splice_plan_prunes_partitions_and_broadcasts(spark, tmp_path):
    """Executed-plan audit: the fold's state scan carries a `_bkt`
    partition filter (untouched buckets never read) and the state
    reaches the output through broadcast semi/anti joins — no Exchange
    of the state on the key."""
    root = str(tmp_path / "b")
    _fold_all(spark, root, "dim", 8)
    vdir = sorted(
        d for d in os.listdir(os.path.join(root, "dim"))
        if d.startswith("v"))[-1]
    state = spark.read.parquet(os.path.join(root, "dim", vdir))
    batch = spark.createDataFrame([(1, T4, "Z", False)], SCHEMA)
    touched = [r["_b"] for r in batch.select(
        bucket_col("k", 8).alias("_b")).distinct().collect()]
    pruned = state.filter(F.col("_bkt").isin(touched)).drop("_bkt")
    spliced = splice_merge(
        pruned, batch.select("k"), "k",
        lambda hot: hot.limit(0) if hot is not None else None)
    plan = spliced._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [_bkt" in plan.replace("\n", " ") or \
        "_bkt#" in plan.split("PartitionFilters")[1][:200]
    assert "BroadcastHashJoin" in plan
    # The only joins over the state are the broadcast splice joins.
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_fold_bucketed_upsert_sink_matches_plain(spark, tmp_path):
    """stream sink contract: fold_batch(n_buckets=...) == plain
    fold_batch, and replayed batch ids are still skipped."""
    from api_to_amt_data_lake_spark.sources.incremental import (
        read_snapshot,
    )
    from api_to_amt_data_lake_spark.streaming.sink import fold_batch

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.LongType()),
        T.StructField("payload", T.StringType()),
    ])
    b0 = [(i, 1, f"p{i}") for i in range(30)]
    b1 = [(3, 2, "updated"), (99, 1, "new")]
    plain, buck = str(tmp_path / "plain"), str(tmp_path / "buck")
    for root, nb in ((plain, None), (buck, 8)):
        assert fold_batch(spark, spark.createDataFrame(b0, schema), 0,
                          root, 2024, "ep", "id", "v", n_buckets=nb)
        assert fold_batch(spark, spark.createDataFrame(b1, schema), 1,
                          root, 2024, "ep", "id", "v", n_buckets=nb)
        # replay: skipped
        assert not fold_batch(spark, spark.createDataFrame(b1, schema), 1,
                              root, 2024, "ep", "id", "v", n_buckets=nb)
    want = {tuple(r) for r in
            read_snapshot(spark, plain, 2024, "ep").collect()}
    got = {tuple(r) for r in
           read_snapshot(spark, buck, 2024, "ep").collect()}
    assert got == want
    assert ("id", "v", "payload") == tuple(
        read_snapshot(spark, buck, 2024, "ep").columns)


def test_plain_store_migrates_into_bucketed(spark, tmp_path):
    """Opting an EXISTING plain history into n_buckets must work (the
    refresh_snapshot contract: mixing modes is fine): the first
    bucketed fold reads the plain version whole, rewrites it bucketed,
    and later folds splice — final content identical to all-plain."""
    from api_to_amt_data_lake_spark.streaming.scd import fold_scd2_batch

    plain, mig = str(tmp_path / "plain"), str(tmp_path / "mig")
    _fold_all(spark, plain, "dim", None)
    # Migration store: batches 0-1 plain, batches 2-3 bucketed.
    for i, rows in enumerate(BATCHES):
        fold_scd2_batch(
            spark, spark.createDataFrame(rows, SCHEMA), i, mig, "dim",
            "k", "ts", ["state"], tombstone_col="deleted",
            n_buckets=8 if i >= 2 else None)
    assert _hist_rows(spark, mig, "dim") == _hist_rows(spark, plain, "dim")
    # The migrated store's current version is bucketed on disk.
    vdir = sorted(d for d in os.listdir(os.path.join(mig, "dim"))
                  if d.startswith("v"))[-1]
    assert any(d.startswith("_bkt=") for d in
               os.listdir(os.path.join(mig, "dim", vdir)))


def test_read_current_version_travel(spark, tmp_path):
    root = str(tmp_path / "b")

    def merge(touched):
        rows = [(1, "x")] if touched is None else [(1, "y")]
        return spark.createDataFrame(rows, ["k", "s"])

    keys = spark.createDataFrame([(1,)], ["k"])
    fold_bucketed(spark, root, "t", keys, merge, "k", 4, keep_versions=5)
    fold_bucketed(spark, root, "t", keys, merge, "k", 4, keep_versions=5)
    assert read_current(spark, root, "t").collect()[0]["s"] == "y"
    assert read_current(spark, root, "t", version=0).collect()[0]["s"] == "x"
