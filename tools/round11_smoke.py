"""Round-11 operator scale smoke: measured datapoints for the
operators added this round (grouped average precision, best-F1
threshold, MRR, and the SIGNED join-IVM fold), so their SCALE.md rows
carry numbers. Prints one JSON line and writes
SCALE_SMOKE_r11_n{n}.json.

Usage: python tools/round11_smoke.py [n_rows]

Inputs are synthesized deterministically from spark.range + xxhash64
(no RNG, no files) — the measurement is plan cost at volume; the
operators' correctness is owned by their conformance oracles and
parity tests.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from api_to_amt_data_lake_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("round11_smoke")
    times: dict[str, float] = {}
    rows: dict[str, int] = {}

    def clock(name: str, fn) -> None:
        t0 = time.time()
        out = fn()
        times[name] = round(time.time() - t0, 2)
        rows[name] = int(out)
        print(f"# {name}: {out} in {times[name]}s", file=sys.stderr)

    h = F.xxhash64("id")
    scored = spark.range(n).select(
        "id",
        F.pmod(h, F.lit(30)).alias("g"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)) / 10_000.0)
        .alias("score"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100)) < 3)
        .cast("int").alias("y"),  # 3% positives: the AP regime
    ).localCheckpoint()

    # 1) Grouped AP + best-F1 over n scored rows / 30 groups — both run
    #    their window over the per-(group, score) count table (<= 30 ×
    #    10k rows), never the corpus.
    from api_to_amt_data_lake_spark.operators.evaluation import (
        best_f1_threshold,
        grouped_average_precision,
    )
    clock("average_precision", lambda: grouped_average_precision(
        scored, ["g"], "score", "y").count())
    clock("best_f1_threshold", lambda: best_f1_threshold(
        scored, ["g"], "score", "y").count())

    # 2) MRR over n ranked rows (n/20 queries of 20, 30 cohorts).
    from api_to_amt_data_lake_spark.operators.search import (
        mean_reciprocal_rank,
    )
    ranked = scored.select(
        F.pmod("g", F.lit(30)).alias("cohort"),
        (F.col("id") / 20).cast("long").alias("q"),
        (F.pmod(F.col("id"), F.lit(20)) + 1).cast("int").alias("rank"),
        F.col("y").alias("rel"),
    ).localCheckpoint()
    clock("mrr", lambda: mean_reciprocal_rank(
        ranked, ["cohort"], "q", "rank", "rel").count())

    # 3) SIGNED join IVM: maintained fold vs full recompute at n rows
    #    per side under 1% MIXED CDC (inserts + updates + deletes on
    #    both sides) — the general algebra q99zzv pins, measured where
    #    it matters: the delta terms probe the bases, never |A|·|B|.
    from api_to_amt_data_lake_spark.operators.delta_agg import (
        delta_join_signed,
        fold_grouped_sums_signed,
        grouped_sums,
        signed_changes,
    )
    from api_to_amt_data_lake_spark.sources.incremental import (
        frame_changes,
    )

    keys = max(n // 10, 10)
    ha = F.pmod(F.xxhash64("id", F.lit(7)), F.lit(300))
    A = spark.range(n).select(
        F.col("id").cast("string").alias("_k"),
        F.pmod(h, F.lit(keys)).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(50)).alias("grp"),
        ha.alias("_h"))
    hb = F.pmod(F.xxhash64("id", F.lit(8)), F.lit(300))
    B = spark.range(n).select(
        F.col("id").cast("string").alias("_k"),
        F.pmod(F.xxhash64("id", F.lit(6)), F.lit(keys)).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(9)).alias("val"),
        hb.alias("_h"))
    # 1% churn split three ways: _h 0 = deleted, 1 = inserted,
    # 2 = updated (group move on A, value change on B).
    a_old = A.filter(F.col("_h") != 1).select("_k", "k", "grp") \
        .localCheckpoint()
    a_new = A.filter(F.col("_h") != 0).select(
        "_k", "k",
        F.when(F.col("_h") == 2, F.col("grp") + 50).otherwise(
            F.col("grp")).alias("grp")).localCheckpoint()
    b_old = B.filter(F.col("_h") != 1).select("_k", "k", "val") \
        .localCheckpoint()
    b_new = B.filter(F.col("_h") != 0).select(
        "_k", "k",
        F.when(F.col("_h") == 2, F.col("val") * 2).otherwise(
            F.col("val")).alias("val")).localCheckpoint()
    state = grouped_sums(a_old.drop("_k").join(b_old.drop("_k"), "k"),
                         ["grp"], ["val"]).localCheckpoint()

    # The CDF production (full-snapshot id diff) is its own number: at
    # real scale the change-version API / CDC log SUPPLIES the deltas
    # and this O(n) diff never runs — the fold below is the recurring
    # per-refresh cost, the diff is the fallback when no change feed
    # exists.
    d_a = d_b = None

    def produce_cdf():
        nonlocal d_a, d_b
        d_a = signed_changes(
            frame_changes(a_old, a_new, "_k", include_old=True),
            ["k", "grp"]).localCheckpoint()
        d_b = signed_changes(
            frame_changes(b_old, b_new, "_k", include_old=True),
            ["k", "val"]).localCheckpoint()
        return d_a.count() + d_b.count()

    def signed_fold():
        delta = delta_join_signed(a_old.drop("_k"), d_a,
                                  b_old.drop("_k"), d_b, ["k"])
        return fold_grouped_sums_signed(
            state, delta, ["grp"], ["val"]).count()

    clock("signed_join_full_recompute", lambda: grouped_sums(
        a_new.drop("_k").join(b_new.drop("_k"), "k"),
        ["grp"], ["val"]).count())
    clock("cdf_diff_production", produce_cdf)
    clock("signed_join_ivm_fold_1pct", signed_fold)

    doc = {"n_rows": n, "times_sec": times, "rows_out": rows}
    (REPO / f"SCALE_SMOKE_r11_n{n}.json").write_text(
        json.dumps(doc, indent=1) + "\n")
    print(json.dumps(doc))


if __name__ == "__main__":
    main()


