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

Scale notes: one refresh costs one shuffle on the natural key (the
upsert's max-struct aggregation) plus a broadcast anti join for the
tombstones. At 100 TB the snapshot should be written with
`write_view_bucketed` on the natural key so successive refreshes and all
downstream view joins read co-located buckets; the plain-parquet path
here keeps the local harness dependency-free.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

from api_to_amt_data_lake_spark.operators.merge import (
    apply_tombstones,
    upsert_latest,
)

_VERSION_RE = re.compile(r"^v(\d+)$")


def _snapshot_dir(snapshot_root: str, school_year: str | int,
                  endpoint: str) -> str:
    return os.path.join(str(snapshot_root), str(school_year), endpoint)


def current_version(snapshot_root: str, school_year: str | int,
                    endpoint: str) -> int | None:
    """Highest complete snapshot version, or None before the first one."""
    base = _snapshot_dir(snapshot_root, school_year, endpoint)
    if not os.path.isdir(base):
        return None
    versions = [
        int(m.group(1))
        for d in os.listdir(base)
        if (m := _VERSION_RE.match(d))
        and os.path.exists(os.path.join(base, d, "_SUCCESS"))
    ]
    return max(versions) if versions else None


def list_versions(snapshot_root: str, school_year: str | int,
                  endpoint: str) -> list[int]:
    """All complete, un-pruned snapshot versions, ascending — the
    time-travel surface (version retention is `refresh_snapshot`'s
    keep_versions)."""
    base = _snapshot_dir(snapshot_root, school_year, endpoint)
    if not os.path.isdir(base):
        return []
    return sorted(
        int(m.group(1))
        for d in os.listdir(base)
        if (m := _VERSION_RE.match(d))
        and os.path.exists(os.path.join(base, d, "_SUCCESS"))
    )


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
    return spark.read.parquet(
        os.path.join(_snapshot_dir(snapshot_root, school_year, endpoint),
                     f"v{v}"))


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
) -> DataFrame:
    """Fold one landed increment into the endpoint's current snapshot.

    - rows in `increment` replace same-key snapshot rows when their
      `version_col` is newer (ties go to the increment);
    - keys in `deletes` are removed (tombstones);
    - the result becomes the new current snapshot and is returned.

    `increment` may carry columns the snapshot has never seen (Ed-Fi
    documents are sparse); the union pads with nulls on either side.
    """
    base = read_snapshot(spark, snapshot_root, school_year, endpoint)
    if base is None:
        # First refresh = upsert into an empty base, NOT dropDuplicates:
        # an increment carrying several versions of one key must keep the
        # newest (the same contract every later refresh enforces), not an
        # arbitrary row.
        merged = upsert_latest(increment.limit(0), increment, [key_col],
                               version_col=version_col)
    else:
        merged = upsert_latest(base, increment, [key_col],
                               version_col=version_col,
                               allow_missing_columns=True)
    if deletes is not None:
        merged = apply_tombstones(merged, deletes, [key_col])

    prev = current_version(snapshot_root, school_year, endpoint)
    next_v = 0 if prev is None else prev + 1
    base_dir = _snapshot_dir(snapshot_root, school_year, endpoint)
    out = os.path.join(base_dir, f"v{next_v}")
    merged.write.mode("overwrite").parquet(out)

    for d in os.listdir(base_dir):
        m = _VERSION_RE.match(d)
        if m and int(m.group(1)) <= next_v - max(1, keep_versions):
            shutil.rmtree(os.path.join(base_dir, d), ignore_errors=True)
    return spark.read.parquet(out)
