"""Incremental-batch merge operators (SURVEY.md §2.1 S2/S4, §2.9).

The reference lands `/deletes` tombstones (`api/api.py:134-136`) and a
change-version watermark (`api/changeVersion.py:57-94`) but never consumes
them — every run is a full re-extract (`README.md:41,68`). These two
operators close that loop so the silver→gold pipeline can run
incrementally:

- `apply_tombstones` removes deleted resources (anti join, J10).
- `upsert_latest` folds an incremental batch into a base snapshot keeping
  the newest change version per natural key.

Scale notes: both shuffle once on the natural key. `upsert_latest` uses
max-per-group + semi-join rather than a row_number window so the dedup
aggregates map-side first (a window sorts every partition; the agg only
shuffles the distinct keys).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_tombstones(df: DataFrame, deletes: DataFrame,
                     keys: Sequence[str]) -> DataFrame:
    """Drop rows whose key appears in the deletes feed (left anti join).

    `deletes` is the landed `/deletes` collection; only its key columns
    are consulted, so the anti join broadcasts when the tombstone batch
    is small (the common case for hourly increments).
    """
    return df.join(deletes.select(*keys).dropDuplicates(), list(keys),
                   "left_anti")


def upsert_latest(base: DataFrame, updates: DataFrame, keys: Sequence[str],
                  version_col: str = "_changeVersion",
                  allow_missing_columns: bool = False) -> DataFrame:
    """Merge an incremental batch into a snapshot: newest version wins.

    Rows present in both keep the one with the greater `version_col`
    (ties go to `updates`); rows present in either side alone survive.
    Equivalent to Delta's `MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED
    INSERT` for append-style sources, expressed on plain DataFrames.
    """
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1)),
        allowMissingColumns=allow_missing_columns)
    latest = tagged.groupBy(*keys).agg(
        F.max(F.struct(F.col(version_col), F.col("_src"))).alias("_w"))
    return (
        tagged.join(latest, list(keys))
        .filter((F.col(version_col) == F.col("_w").getField(version_col))
                & (F.col("_src") == F.col("_w").getField("_src")))
        .drop("_w", "_src")
    )
