"""Incremental silver snapshot maintenance (SURVEY.md §2.1 S2/S4, §2.9).

The reference lands change-version increments and `/deletes` tombstones
but never consumes them — every run re-extracts everything
(`README.md:41,68`; `api/changeVersion.py:57-94`; `api/api.py:134-136`).
This module closes that loop: each refresh folds one landed increment
(new/changed documents + tombstones) into a parquet "current" snapshot
per endpoint, so the gold phase always reads a complete, deduplicated
collection without a full re-extract.

Snapshot layout: `{snapshot_root}/{school_year}/{endpoint}/v{N}/` —
refreshes write the next version directory and then prune old ones.
Versioned directories rather than in-place overwrite because Spark
cannot overwrite a path it is currently reading; the version bump also
gives crash-safety (a failed write never corrupts the current version —
readers keep using v{N} until v{N+1} is complete).

Scale notes: the plain path costs one shuffle of the whole snapshot on
the natural key per refresh (the upsert's max-struct aggregation). The
`n_buckets` opt-in is the 100 TB shape: snapshots are written
hash-BUCKETED on the natural key (registered catalog tables, one per
version), the upsert switches to a broadcast SPLICE (carry-over = base
anti-join changed-keys, winners = upsert over base semi-join
changed-keys ∪ increment), so the full snapshot is never exchanged on
the key — the only hash shuffle covers the touched rows, i.e. cost
tracks the increment — and successive refreshes plus every downstream
same-key join read co-located buckets with zero Exchange
(plan-audited in tests/test_incremental_gold.py).
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators.merge import (
    apply_tombstones,
    upsert_latest,
)
from api_to_amt_data_lake_spark.sources.versioned import (
    VERSION_RE as _VERSION_RE,
)
from api_to_amt_data_lake_spark.sources.versioned import complete_versions


def snapshot_table_name(snapshot_root: str, school_year: str | int,
                        endpoint: str, version: int) -> str:
    """Catalog table name for a bucketed snapshot version (bucketing
    metadata only survives through the table catalog — a plain
    `read.parquet` of the same files would forget it). The root-path
    hash keeps two lakes on one metastore from colliding."""
    tag = hashlib.md5(str(snapshot_root).encode()).hexdigest()[:6]
    safe = re.sub(r"[^A-Za-z0-9_]", "_", f"{endpoint}_{school_year}")
    return f"snap_{safe}_{tag}_v{version}"


def _snapshot_dir(snapshot_root: str, school_year: str | int,
                  endpoint: str) -> str:
    return os.path.join(str(snapshot_root), str(school_year), endpoint)


def current_version(snapshot_root: str, school_year: str | int,
                    endpoint: str) -> int | None:
    """Highest complete snapshot version, or None before the first one."""
    versions = complete_versions(
        _snapshot_dir(snapshot_root, school_year, endpoint))
    return versions[-1] if versions else None


def list_versions(snapshot_root: str, school_year: str | int,
                  endpoint: str) -> list[int]:
    """All complete, un-pruned snapshot versions, ascending — the
    time-travel surface (version retention is `refresh_snapshot`'s
    keep_versions)."""
    return complete_versions(
        _snapshot_dir(snapshot_root, school_year, endpoint))


def read_snapshot(spark: SparkSession, snapshot_root: str,
                  school_year: str | int, endpoint: str,
                  version: int | None = None) -> DataFrame | None:
    """The current snapshot DataFrame — or, with `version`, that older
    complete version (time travel within the retention window; raises
    if it was pruned or never completed). None before the first
    refresh."""
    if version is not None:
        if version not in list_versions(snapshot_root, school_year,
                                        endpoint):
            raise ValueError(
                f"snapshot v{version} of {endpoint}/{school_year} is not "
                f"available (pruned or incomplete); kept versions: "
                f"{list_versions(snapshot_root, school_year, endpoint)}")
        v = version
    else:
        v = current_version(snapshot_root, school_year, endpoint)
        if v is None:
            return None
    tname = snapshot_table_name(snapshot_root, school_year, endpoint, v)
    if spark.catalog.tableExists(tname):
        # Bucketed snapshot: the catalog read keeps the bucket spec, so
        # same-key joins and the splice refresh skip their Exchange.
        return spark.table(tname)
    df = spark.read.parquet(
        os.path.join(_snapshot_dir(snapshot_root, school_year, endpoint),
                     f"v{v}"))
    if "_bkt" in df.columns:
        # Written by the bucketed MERGE-splice store
        # (sources/bucket_store.py): _bkt is physical layout, not data.
        df = df.drop("_bkt")
    return df


def merge_increment(
    base: DataFrame | None,
    increment: DataFrame,
    deletes: DataFrame | None,
    key_col: str,
    version_col: str,
    spliced: bool = False,
) -> DataFrame:
    """The refresh's merge plan, returned unexecuted (so tests can audit
    it). `spliced=False` is the plain shape: one upsert shuffle of
    base ∪ increment on the key. `spliced=True` is the bucketed/100 TB
    shape: the changed-key set is broadcast, carry-over rows leave the
    base through a broadcast ANTI join and only the touched rows (base
    ⋉ keys ∪ increment) pass through the upsert's hash shuffle — the
    full base is never exchanged on the natural key."""
    if base is None:
        # First refresh = upsert into an empty base, NOT dropDuplicates:
        # an increment carrying several versions of one key must keep the
        # newest (the same contract every later refresh enforces), not an
        # arbitrary row.
        merged = upsert_latest(increment.limit(0), increment, [key_col],
                               version_col=version_col)
    elif spliced:
        keys = F.broadcast(increment.select(key_col).distinct())
        kept = base.join(keys, key_col, "left_anti")
        touched = base.join(keys, key_col, "left_semi")
        winners = upsert_latest(touched, increment, [key_col],
                                version_col=version_col,
                                allow_missing_columns=True)
        merged = kept.unionByName(winners, allowMissingColumns=True)
    else:
        merged = upsert_latest(base, increment, [key_col],
                               version_col=version_col,
                               allow_missing_columns=True)
    if deletes is not None:
        merged = apply_tombstones(merged, deletes, [key_col])
    return merged


def refresh_snapshot(
    spark: SparkSession,
    increment: DataFrame,
    deletes: DataFrame | None,
    snapshot_root: str,
    school_year: str | int,
    endpoint: str,
    key_col: str = "id",
    version_col: str = "_lastModifiedDate",
    keep_versions: int = 2,
    n_buckets: int | None = None,
) -> DataFrame:
    """Fold one landed increment into the endpoint's current snapshot.

    - rows in `increment` replace same-key snapshot rows when their
      `version_col` is newer (ties go to the increment);
    - keys in `deletes` are removed (tombstones);
    - the result becomes the new current snapshot and is returned.

    `increment` may carry columns the snapshot has never seen (Ed-Fi
    documents are sparse); the union pads with nulls on either side.

    `n_buckets` opts into bucketed snapshots (VERDICT r4 item 7): the
    new version is written hash-bucketed + sorted on `key_col` as a
    catalog table, the merge switches to the broadcast splice (see
    `merge_increment`), and `read_snapshot` hands back the bucketed
    table — so refresh N+1 and every downstream same-key join read
    co-located buckets without exchanging the snapshot. Mixing modes is
    fine (an unbucketed base refreshed with n_buckets comes out
    bucketed, and vice versa).
    """
    base = read_snapshot(spark, snapshot_root, school_year, endpoint)
    merged = merge_increment(base, increment, deletes, key_col,
                             version_col, spliced=n_buckets is not None)

    prev = current_version(snapshot_root, school_year, endpoint)
    next_v = 0 if prev is None else prev + 1
    base_dir = _snapshot_dir(snapshot_root, school_year, endpoint)
    out = os.path.join(base_dir, f"v{next_v}")
    tname = snapshot_table_name(snapshot_root, school_year, endpoint,
                                next_v)
    if n_buckets is not None:
        spark.sql(f"DROP TABLE IF EXISTS {tname}")  # stale metadata only
        (merged.write.mode("overwrite").format("parquet")
         .bucketBy(n_buckets, key_col).sortBy(key_col)
         .option("path", out).saveAsTable(tname))
    else:
        merged.write.mode("overwrite").parquet(out)

    for d in os.listdir(base_dir):
        m = _VERSION_RE.match(d)
        if m and int(m.group(1)) <= next_v - max(1, keep_versions):
            shutil.rmtree(os.path.join(base_dir, d), ignore_errors=True)
            spark.sql("DROP TABLE IF EXISTS " + snapshot_table_name(
                snapshot_root, school_year, endpoint, int(m.group(1))))
    return read_snapshot(spark, snapshot_root, school_year, endpoint)


def snapshot_changes(
    spark: SparkSession, snapshot_root: str, school_year: str | int,
    endpoint: str, key_col: str, from_version: int, to_version: int,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change data feed between two retained snapshot versions: one row
    per key whose state differs, with `_change_type` in
    ('insert', 'update', 'delete') and the to-version's columns (the
    from-version's for deletes) — the Delta/Iceberg CDF read pattern,
    derived from the versioned directories time travel already keeps.
    Downstream incremental consumers (gold refresh, stream backfill)
    process this diff instead of re-reading the full snapshot.

    `compare_cols` limits the update comparison (default: every shared
    non-key column). One full-outer join keyed on the natural key —
    with bucketed snapshots both sides read co-located buckets, so the
    join needs no Exchange.
    """
    old = read_snapshot(spark, snapshot_root, school_year, endpoint,
                        version=from_version)
    new = read_snapshot(spark, snapshot_root, school_year, endpoint,
                        version=to_version)
    if old is None or new is None:
        raise ValueError("both versions must exist to diff")
    return frame_changes(old, new, key_col, compare_cols)


def frame_changes(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str] | None = None,
    include_old: bool = False,
) -> DataFrame:
    """The CDF diff itself, over any two key-consistent frames (the
    snapshot read above is one producer; tests and the delta-agg fold
    build versions from arbitrary sources). With `include_old`, update
    and delete rows also carry `_old_{c}` for every compared column —
    what a DELTA consumer needs (an update's aggregate contribution is
    new − old, and a group-key change must retract from the OLD group),
    and what the plain row-level consumers don't."""
    cols = compare_cols if compare_cols is not None else [
        c for c in new.columns if c != key_col and c in old.columns]
    o = old.select(
        F.col(key_col),
        *[F.col(c).alias(f"_old_{c}") for c in cols],
        F.lit(True).alias("_in_old"))
    n = new.select(
        F.col(key_col), *cols, F.lit(True).alias("_in_new"))
    j = o.join(n, key_col, "full_outer")
    same = F.lit(True)
    for c in cols:
        same = same & F.col(c).eqNullSafe(F.col(f"_old_{c}"))
    in_old = F.col("_in_old").isNotNull()
    in_new = F.col("_in_new").isNotNull()
    change = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    extra = (
        [F.when(F.col("_change_type") != "insert",
                F.col(f"_old_{c}")).alias(f"_old_{c}") for c in cols]
        if include_old else [])
    return (
        j.withColumn("_change_type", change)
        .filter(F.col("_change_type").isNotNull())
        .select(
            F.col(key_col), F.col("_change_type"),
            *[F.when(F.col("_change_type") == "delete",
                     F.col(f"_old_{c}")).otherwise(F.col(c)).alias(c)
              for c in cols],
            *extra)
    )
