"""File-level min/max statistics manifest: listing-time data skipping.

Parquet already prunes at the ROW-GROUP level — but only after the
reader has listed the dataset and opened every file's footer. At
100 TB / millions of files, the listing + footer round-trips ARE the
cost for a selective query. Delta and Iceberg fix this by keeping
per-file column stats in the table metadata and pruning the file LIST
before any file is opened; this module is that mechanism over plain
parquet directories: one manifest JSON of per-file [min, max] per
tracked column, written with a single Spark aggregation, consulted at
read time to hand Spark only the files whose range intersects the
predicate.

The pruned read is CONSERVATIVE (a kept file may still contain no
matching rows — the caller's filter still applies; a dropped file
provably contains none), so `read_pruned(...).filter(pred)` ≡
`read(...).filter(pred)` row-for-row, just over fewer opened files.
Files with NULL stats (all-null column) are always kept. The manifest
is advisory metadata: writers that bypass `write_manifest` leave files
unlisted, and `read_pruned` REFUSES a manifest that does not cover the
directory listing rather than silently missing data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_stats_manifest.json"


def _rel_file(uri: str, root_abs: str) -> str:
    """Dataset-relative path of a file URI from input_file_name():
    the manifest key. Flat layouts key by basename (backwards
    compatible); hive-partitioned layouts (`_bkt=3/part-…`) keep their
    partition dirs so two buckets' identically-named parts never
    collide."""
    from urllib.parse import unquote, urlparse

    path = uri
    if "://" in uri or uri.startswith("file:"):
        path = unquote(urlparse(uri).path)
    return os.path.relpath(path, root_abs)


def write_manifest(spark: SparkSession, dataset_path: str,
                   stat_cols: list[str]) -> dict:
    """Compute and persist per-file min/max for `stat_cols` over every
    parquet file under `dataset_path` (flat or hive-partitioned — e.g.
    a bucket store version dir). One scan, one file-keyed aggregation
    (partial-aggregated map-side; the shuffled state is
    2 × |files| × |cols| scalars). Returns the manifest dict."""
    root_abs = os.path.abspath(str(dataset_path))
    df = spark.read.parquet(str(dataset_path))
    per_file = (
        df.groupBy(F.input_file_name().alias("_file"))
        .agg(*[f for c in stat_cols
               for f in (F.min(c).alias(f"min_{c}"),
                         F.max(c).alias(f"max_{c}"))])
    ).collect()
    files = {}
    for r in per_file:
        name = _rel_file(r["_file"], root_abs)
        files[name] = {
            c: [r[f"min_{c}"], r[f"max_{c}"]] for c in stat_cols
        }
    manifest = {"columns": stat_cols, "files": files}
    tmp = os.path.join(str(dataset_path), _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(str(dataset_path), _MANIFEST))
    return manifest


def _data_files(dataset_path: str) -> list[str]:
    """Dataset-relative paths of every parquet data file — walks into
    hive partition dirs (`col=value/…`) but not hidden/metadata dirs."""
    root = str(dataset_path)
    out: list[str] = []
    for dirpath, dirs, files in os.walk(root):
        # Spark's own path filter: hidden/metadata names are skipped
        # UNLESS they contain '=' (partition dirs like `_bkt=3`).
        dirs[:] = [d for d in dirs
                   if "=" in d or not d.startswith((".", "_"))]
        for name in files:
            if name.endswith(".parquet") and not name.startswith("."):
                out.append(os.path.relpath(
                    os.path.join(dirpath, name), root))
    return sorted(out)


def read_pruned(
    spark: SparkSession, dataset_path: str,
    ranges: dict[str, tuple],
) -> tuple[DataFrame, list[str]]:
    """Read only the files whose manifest stats intersect every
    `{col: (lo, hi)}` range (either bound may be None for open-ended).
    Returns (df, kept_files) — the file list is surfaced so callers
    and tests can assert how much was skipped. The returned frame is
    the UNFILTERED content of the kept files: apply the row-level
    predicate on top (pruning is conservative, not exact)."""
    root = str(dataset_path)
    with open(os.path.join(root, _MANIFEST)) as f:
        manifest = json.load(f)
    listing = _data_files(root)
    missing = [n for n in listing if n not in manifest["files"]]
    if missing:
        raise ValueError(
            f"manifest does not cover {len(missing)} data files "
            f"(e.g. {missing[0]}); rewrite it with write_manifest")
    kept = []
    for name in listing:
        stats = manifest["files"][name]
        keep = True
        for col, (lo, hi) in ranges.items():
            mn, mx = stats[col]
            if mn is None or mx is None:
                continue  # all-null or untracked: always keep
            if (hi is not None and mn > hi) or \
                    (lo is not None and mx < lo):
                keep = False
                break
        if keep:
            kept.append(name)
    return _read_kept(spark, root, kept), kept


def read_pruned_ids(
    spark: SparkSession, dataset_path: str,
    id_col: str, ids,
) -> tuple[DataFrame, list[str]]:
    """POINT-LOOKUP file pruning: keep only the files whose tracked
    [min, max] range for `id_col` contains at least one of `ids` — the
    read shape of an id-keyed candidate fetch (ANN exact re-rank, CDC
    key splice) against a range-clustered store. A single (lo, hi)
    envelope over a scattered id set keeps almost every file; checking
    each file against the SORTED id list (one bisect per file) keeps
    only the files that can actually hold a candidate. Same
    conservative contract as `read_pruned`: apply the row-level id
    filter on top."""
    import bisect

    root = str(dataset_path)
    with open(os.path.join(root, _MANIFEST)) as f:
        manifest = json.load(f)
    listing = _data_files(root)
    missing = [n for n in listing if n not in manifest["files"]]
    if missing:
        raise ValueError(
            f"manifest does not cover {len(missing)} data files "
            f"(e.g. {missing[0]}); rewrite it with write_manifest")
    vals = sorted(set(ids))
    kept = []
    for name in listing:
        mn, mx = manifest["files"][name][id_col]
        if mn is None or mx is None:
            kept.append(name)  # all-null stats: always keep
            continue
        i = bisect.bisect_left(vals, mn)
        if i < len(vals) and vals[i] <= mx:
            kept.append(name)
    return _read_kept(spark, root, kept), kept


def _read_kept(spark: SparkSession, root: str,
               kept: list[str]) -> DataFrame:
    if not kept:
        # preserve schema: read everything, keep no rows
        return spark.read.parquet(root).filter(F.lit(False))
    paths = [os.path.join(root, n) for n in kept]
    # basePath keeps hive partition columns (e.g. the bucket store's
    # _bkt) when the kept files sit under partition dirs; harmless for
    # flat layouts.
    return spark.read.option("basePath", root).parquet(*paths)
