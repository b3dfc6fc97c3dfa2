"""Round-10 operator scale smoke: measured 1M-row datapoints for the
operators added this round, so their SCALE.md rows carry numbers, not
prose. Prints one JSON line and writes SCALE_SMOKE_r10.json.

Usage: python tools/round10_smoke.py [n_rows]

Inputs are synthesized deterministically from spark.range + xxhash64
(no RNG, no files): the measurement is plan cost at volume, not data
realism — the correctness of every operator here is owned by its
conformance oracle and parity tests.
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("round10_smoke")
    times: dict[str, float] = {}

    rows: dict[str, int] = {}

    def clock(name: str, fn) -> None:
        t0 = time.time()
        out = fn()
        times[name] = round(time.time() - t0, 2)
        rows[name] = int(out)
        print(f"# {name}: {out} in {times[name]}s", file=sys.stderr)

    h = F.xxhash64("id")
    base = spark.range(n).select(
        "id",
        F.pmod(h, F.lit(30)).alias("g"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000))
        .alias("score"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(4)).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(4)).alias("b"),
    ).localCheckpoint()  # freeze inputs so each op pays only itself

    # 1) Per-group percentile normalization over n rows / 30 groups.
    from api_to_amt_data_lake_spark.operators.sampling import (
        percentile_normalize,
    )
    clock("percentile_normalize", lambda: percentile_normalize(
        base, ["g"], "score", "id").count())

    # 2) Grouped Cohen's kappa over n label pairs.
    from api_to_amt_data_lake_spark.operators.aggregates import (
        cohens_kappa,
    )
    clock("cohens_kappa", lambda: cohens_kappa(
        base, "a", "b", ["g"]).count())

    # 3) NDCG@10 + P/R@10 over n ranked rows (n/20 queries of 20).
    from api_to_amt_data_lake_spark.operators.search import (
        ndcg_at_k,
        precision_recall_at_k,
    )
    ranked = base.select(
        (F.col("id") / 20).cast("long").alias("q"),
        (F.pmod(F.col("id"), F.lit(20)) + 1).cast("int").alias("rank"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(4)).alias("rel"),
    ).localCheckpoint()
    clock("ndcg_at_10", lambda: ndcg_at_k(
        ranked, "q", "rank", "rel", k=10).count())
    clock("pr_at_10", lambda: precision_recall_at_k(
        ranked, "q", "rank", "rel", k=10).count())

    # 4) Label propagation, 3 rounds over ~n/2 edges / n/10 nodes.
    from api_to_amt_data_lake_spark.operators.graph import (
        label_propagation,
        symmetrize,
    )
    nodes = max(n // 10, 10)
    edges = spark.range(n // 2).select(
        F.pmod(h, F.lit(nodes)).alias("s"),
        F.pmod(F.xxhash64("id", F.lit(5)), F.lit(nodes)).alias("t"),
    ).filter(F.col("s") != F.col("t"))
    clock("label_propagation_3r", lambda: label_propagation(
        symmetrize(edges, "s", "t"), iters=3).count())

    # 5) Join IVM: maintained refresh vs full-join recompute at n rows
    #    per side, 1% insert deltas. The point: refresh cost tracks the
    #    DELTA.
    from api_to_amt_data_lake_spark.operators.delta_agg import (
        delta_join_increment,
    )
    keys = max(n // 10, 10)
    A = spark.range(n).select(
        F.pmod(h, F.lit(keys)).alias("k"),
        F.col("id").alias("a_x")).localCheckpoint()
    B = spark.range(n).select(
        F.pmod(F.xxhash64("id", F.lit(6)), F.lit(keys)).alias("k"),
        F.col("id").alias("b_y")).localCheckpoint()
    new_a = F.pmod(F.xxhash64("a_x", F.lit(7)), F.lit(100)) == 0
    new_b = F.pmod(F.xxhash64("b_y", F.lit(8)), F.lit(100)) == 0
    a_old, d_a = A.filter(~new_a), A.filter(new_a)
    b_old, d_b = B.filter(~new_b), B.filter(new_b)
    clock("join_full_recompute", lambda: A.join(B, "k").count())
    clock("join_ivm_increment_1pct", lambda: delta_join_increment(
        a_old, d_a, b_old, d_b, ["k"]).count())

    doc = {"n_rows": n, "times_sec": times, "rows_out": rows}
    (REPO / f"SCALE_SMOKE_r10_n{n}.json").write_text(
        json.dumps(doc, indent=1) + "\n")
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
