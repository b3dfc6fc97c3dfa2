"""Scale smoke for the round-9 sweep/sketch operators at 10M+ rows.

Usage: python tools/sweep_smoke.py [n_rows]

- `interval_coverage`: 10M spans over 100k keys (~100 spans/key).
  The sort-sweep's one shuffle vs the quadratic overlap self-join it
  replaces (the naive form at 100 spans/key is 10k compares/key — run
  here on a 1% key sample for a measured ratio, never the full input).
- `pareto_frontier_2d`: 10M points over 1k groups. Reports frontier
  size and wall time; the naive NOT-EXISTS skyline at this shape is
  1e10 compares/group-batch and is not run even sampled.
- `minu_sketch` + estimate: distinct user count over 10M events with
  ~1M distinct keys, k=1024 cells. Reports estimate, truth, relative
  error, and wall time vs exact countDistinct in the same session.

JSON-line output, mirroring tools/join_smoke.py.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from api_to_amt_data_lake_spark.operators.frontier import (  # noqa: E402
    pareto_frontier_2d,
)
from api_to_amt_data_lake_spark.operators.intervals import (  # noqa: E402
    interval_coverage,
)
from api_to_amt_data_lake_spark.operators.sketches import (  # noqa: E402
    minu_estimate,
    minu_sketch,
)
from api_to_amt_data_lake_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("sweep_smoke")
    out: dict = {"n_rows": n}

    # --- interval coverage: ~100 spans/key, heavy overlap ----------
    start = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000))
    spans = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(n // 100)).alias("k"),
        start.alias("s"),
        (start + 1 + F.pmod(F.xxhash64("id", F.lit(2)),
                            F.lit(50_000))).alias("e"),
    ).localCheckpoint()
    spans.count()
    t0 = time.time()
    cov = interval_coverage(spans, ["k"], "s", "e")
    out["coverage_keys"] = cov.count()
    out["coverage_s"] = round(time.time() - t0, 2)

    # naive quadratic overlap-merge on a 1% key sample, for the ratio
    sample_keys = spans.filter(F.col("k") < (n // 100) // 100)
    t0 = time.time()
    a, b = sample_keys.alias("a"), sample_keys.alias("b")
    # covered length via the classic point-containment trick is itself
    # quadratic; time the candidate overlap join that any self-join
    # formulation pays.
    n_overlaps = a.join(
        b, (F.col("a.k") == F.col("b.k"))
        & (F.col("a.s") < F.col("b.e")) & (F.col("b.s") < F.col("a.e"))
    ).count()
    out["naive_1pct_overlap_pairs"] = n_overlaps
    out["naive_1pct_s"] = round(time.time() - t0, 2)

    # --- pareto frontier: 10M points, 1k groups ---------------------
    pts = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("g"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1_000_000)) / 100.0)
        .alias("x"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(1_000_000)).alias("y"),
    ).localCheckpoint()
    pts.count()
    t0 = time.time()
    out["frontier_rows"] = pareto_frontier_2d(pts, "x", "y",
                                              ["g"]).count()
    out["frontier_s"] = round(time.time() - t0, 2)

    # --- minu distinct sketch: ~1M distinct over 10M rows -----------
    ev = spark.range(n).select(
        F.lit("g").alias("grp"),
        F.pmod(F.xxhash64("id"), F.lit(n // 10)).alias("u"),
    ).localCheckpoint()
    ev.count()
    t0 = time.time()
    sk = minu_sketch(ev, ["grp"], "u", k_cells=1024)
    est = minu_estimate(sk, ["grp"], k_cells=1024).collect()[0]
    out["minu_est"] = est.n_distinct_est
    out["minu_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    truth = ev.select(F.countDistinct("u")).collect()[0][0]
    out["exact_distinct"] = truth
    out["exact_s"] = round(time.time() - t0, 2)
    out["minu_rel_err"] = round(abs(est.n_distinct_est - truth) / truth, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
