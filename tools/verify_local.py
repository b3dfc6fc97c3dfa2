"""Local stand-in for the driver's correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` on DuckDB at
the given scale factor, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
stringified with float rounding).

Usage: python tools/verify_local.py [sf_dir] [query_name ...]

A FULL run (no query-name filter) also persists its results to
CORRECTNESS_local_rNN.json at the repo root (NN = the round after the
latest recorded BENCH artifact), in the driver artifact's per-query
schema — durable recorded evidence for the queries outside the
driver's 50-query window. Partial runs never write the artifact.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "<null>"
        if pd.isna(v) if not isinstance(v, (list, tuple)) else False:
            return "<null>"
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)

    out = df.map(norm)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from api_to_amt_data_lake_spark.session import get_spark

    # Share bench.py's single-runner lock: a concurrent local[32] JVM
    # (e.g. a stray bench while verifying) inflates timings ~10x and can
    # starve either run. Block until the other runner finishes.
    lock_file = open(REPO / ".bench.lock", "w")
    try:
        import fcntl
        fcntl.flock(lock_file, fcntl.LOCK_EX)
    except ImportError:
        pass

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    record: dict[str, dict] = {}

    def rec(name, *, spark_rows=None, oracle_rows=None, rows_match=None,
            schema_match=None, hash_match=None, err=None):
        record[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            rec(name, err=f"spark error: {e}"[:500])
            print(f"FAIL  {name}: spark error: {e}")
            continue
        spark_s = time.time() - t0
        from api_to_amt_data_lake_spark.plans.conformance import (
            PARITY_BASELINES,
        )
        if name not in oracles and name in PARITY_BASELINES:
            # Non-SQL-expressible query with a deterministic in-engine
            # baseline (e.g. q59's stream vs the oracle-verified batch
            # binding): hash-compare exactly like the oracle path.
            try:
                odf = PARITY_BASELINES[name](spark, sf_dir).toPandas()
            except Exception as e:
                failures.append(name)
                rec(name, spark_rows=len(sdf),
                    err=f"parity baseline error: {e}"[:500])
                print(f"FAIL  {name}: parity baseline error: {e}")
                continue
        elif name not in oracles:
            rec(name, spark_rows=len(sdf))
            print(f"OK?   {name}: rows={len(sdf)} (no oracle, rows-only) "
                  f"[{spark_s:.1f}s]")
            continue
        else:
            try:
                odf = con.sql(oracles[name]).df()
            except Exception as e:
                failures.append(name)
                rec(name, spark_rows=len(sdf), err=f"oracle error: {e}"[:500])
                print(f"FAIL  {name}: oracle error: {e}")
                continue
        if len(sdf) != len(odf):
            failures.append(name)
            rec(name, spark_rows=len(sdf), oracle_rows=len(odf),
                rows_match=False)
            print(f"FAIL  {name}: rowcount spark={len(sdf)} duckdb={len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(name)
            rec(name, spark_rows=len(sdf), oracle_rows=len(odf),
                rows_match=True, schema_match=False)
            print(f"FAIL  {name}: columns spark={sorted(sdf.columns)} "
                  f"duckdb={sorted(odf.columns)}")
            continue
        cs, co = canon(sdf), canon(odf)
        # Zero matching rows on both sides IS a pass: pandas
        # DataFrame.equals is dtype-sensitive and two empty frames
        # keep their pre-canon dtypes (object vs float64), which
        # spuriously failed q86g at sf0.001 where the filter
        # legitimately selects nothing in either engine.
        if len(cs) != 0 and not cs.equals(co):
            failures.append(name)
            rec(name, spark_rows=len(sdf), oracle_rows=len(odf),
                rows_match=True, schema_match=True, hash_match=False)
            diff_mask = (cs != co).any(axis=1)
            print(f"FAIL  {name}: value mismatch in {int(diff_mask.sum())} rows")
            merged = pd.concat(
                [cs[diff_mask].head(3).add_suffix("_spark"),
                 co[diff_mask].head(3).add_suffix("_duck")], axis=1)
            print(merged.to_string())
            continue
        rec(name, spark_rows=len(sdf), oracle_rows=len(odf),
            rows_match=True, schema_match=True, hash_match=True)
        print(f"PASS  {name}: rows={len(sdf)} [{spark_s:.1f}s]")

    if not only and sf_dir.rstrip("/").endswith("sf0.01"):
        # persist only the canonical-SF run: the artifact mirrors the
        # driver's sf0.01 gate, and a full sf0.001/sf0.1 sweep must not
        # overwrite it with different row counts
        import json
        import re
        rounds = [int(m.group(1)) for f in REPO.glob("BENCH_r*.json")
                  if (m := re.match(r"BENCH_r(\d+)", f.name))]
        nn = (max(rounds) + 1) if rounds else 0
        out = REPO / f"CORRECTNESS_local_r{nn:02d}.json"
        out.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
        print(f"wrote {out.name}: {len(record)} queries")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
