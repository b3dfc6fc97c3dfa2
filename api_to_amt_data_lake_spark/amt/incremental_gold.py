"""Gold-side incremental view maintenance.

`sources/incremental.py` keeps the SILVER layer current without full
re-extracts; this module closes the remaining loop at the GOLD layer:
when a change-version pull reports which natural keys changed (new,
updated, or tombstoned), a view can be refreshed by recomputing ONLY
the rows of those keys and splicing them with the carried-over rows of
the existing gold parquet — instead of the reference's rebuild-
everything-every-hour (`parquet/amt_parquet.py:27-36` rebuilds all 41
views unconditionally each run).

Semantics (the contract the test asserts):
    refresh(changed) == full rebuild, whenever `changed` is a superset
    of the keys whose output rows actually differ.
Deleted keys fall out naturally: the recomputed slice no longer emits
them and the anti-join removes their old rows.

Scale shape: the recomputed slice is `view ⋉ changed_keys` — the semi
join broadcasts the (small) changed-key set, and with runtime bloom
filters enabled (`session.py`) the key filter is pushed into the
silver scans feeding the view, so compute is proportional to the
change set, not the collection. The carry-over side scans the existing
gold once with a broadcast anti join. The swap is write-to-temp +
rename, because Spark cannot overwrite a path it is reading; silver
snapshot versioning (`sources/incremental.py`) remains the crash-safe
layer — a killed gold swap is repaired by re-running the refresh.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.amt import registry


def refresh_view_incremental(
    spark: SparkSession,
    name: str,
    silver_root: str,
    gold_root: str,
    school_year: str | int,
    changed_keys: DataFrame,
    key_col: str,
    run_date: str | None = None,
) -> str:
    """Refresh one gold view for the given changed natural keys.

    `changed_keys` is a one-column DataFrame (column name = `key_col`)
    of keys to recompute. Returns the gold path. If the view has never
    been written, falls back to a full build-and-write.
    """
    path = os.path.join(gold_root, str(school_year), name)
    fresh = registry.build_view(name, spark, silver_root, school_year,
                                run_date)
    keys = changed_keys.select(key_col).distinct()

    if not os.path.exists(path):
        fresh.write.mode("overwrite").parquet(path)
        return path

    recomputed = fresh.join(F.broadcast(keys), key_col, "left_semi")
    carried = (
        spark.read.parquet(path)
        .join(F.broadcast(keys), key_col, "left_anti")
    )
    out = carried.unionByName(recomputed)

    tmp = path + ".refresh-tmp"
    old = path + ".refresh-old"
    # A crash between the renames below can strand either directory;
    # clear leftovers first so the swap's os.rename calls cannot fail on
    # an existing target (re-running the refresh is the repair path).
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    out.write.mode("overwrite").parquet(tmp)
    # Swap AFTER the new data is fully committed; the non-atomic window
    # is two renames, and a crash in between is repaired by re-running.
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return path
