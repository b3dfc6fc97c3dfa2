"""Incremental snapshot refresh scale smoke: plain upsert vs the
bucketed broadcast-splice shape at volume.

Usage: python tools/snapshot_smoke.py [n_rows] [n_increment] [n_buckets]

Builds an n-row first snapshot, then times folding an n_increment-row
increment (updates + inserts + tombstones) into it twice — once with
the plain shape (the whole base shuffles on the key through the
upsert) and once with `n_buckets` set (bucketed snapshot + broadcast
splice: the base is never exchanged on the key; hash-shuffle cost
tracks the increment). Row parity between the two results is asserted.
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from api_to_amt_data_lake_spark.session import get_spark  # noqa: E402
from api_to_amt_data_lake_spark.sources.incremental import (  # noqa: E402
    refresh_snapshot,
    snapshot_table_name,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_inc = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark("snapshot_smoke")
    root = tempfile.mkdtemp(prefix="snapshot_smoke_")

    def docs(ids, v):
        return ids.select(
            F.col("id"),
            F.lit(v).alias("v"),
            F.concat(F.lit("payload-"), F.col("id")).alias("name"),
            F.sha2(F.concat(F.lit(v), F.col("id").cast("string")), 256)
            .alias("body"),
        )

    base_ids = spark.range(n)
    # increment: half updates of existing keys, half inserts past n
    inc_ids = spark.range(n_inc).select(
        F.when(F.col("id") % 2 == 0, F.col("id") * (n // n_inc))
        .otherwise(n + F.col("id")).alias("id"))
    dels = spark.range(100).select((F.col("id") * 97 + 13).alias("id"))

    out: dict[str, object] = {"n_rows": n, "n_increment": n_inc,
                              "n_buckets": n_buckets}
    try:
        for label, nb in (("plain", None), ("bucketed", n_buckets)):
            ep = f"coll_{label}"
            t0 = time.time()
            refresh_snapshot(spark, docs(base_ids, 1), None, root, 2024,
                             ep, key_col="id", version_col="v",
                             n_buckets=nb)
            out[f"{label}_first_refresh_sec"] = round(time.time() - t0, 1)
            t0 = time.time()
            snap = refresh_snapshot(spark, docs(inc_ids, 2), dels, root,
                                    2024, ep, key_col="id",
                                    version_col="v", n_buckets=nb)
            cnt = snap.count()
            out[f"{label}_incremental_refresh_sec"] = \
                round(time.time() - t0, 1)
            out[f"{label}_rows"] = cnt
            print(f"# {label}: first={out[f'{label}_first_refresh_sec']}s "
                  f"incremental={out[f'{label}_incremental_refresh_sec']}s "
                  f"rows={cnt}", file=sys.stderr)
        assert out["plain_rows"] == out["bucketed_rows"], out
        print(json.dumps(out))
    finally:
        for label in ("plain", "bucketed"):
            for v in range(3):
                spark.sql("DROP TABLE IF EXISTS " + snapshot_table_name(
                    root, 2024, f"coll_{label}", v))
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
