"""Scale smoke for the round-9 join operators at 10M+ rows.

Usage: python tools/join_smoke.py [n_points]

- `bloom_semi_join`: 10M-row large side, 1%-selective small side
  (100k keys). Times the bloom-prefiltered semi join against the plain
  semi join in the same session, and reports how many rows the bitmap
  pass pruned before the exact verify — the number that decides how
  many bytes reach the one remaining shuffle at 100 TB. The small
  side's key SET (100k longs) still broadcasts locally; the bitmap's
  value shows at key counts where it would not.
- `range_bin_join`: 10M uniform points vs 10k spans of ~2 bin widths.
  A bare BETWEEN join would be a 10M x 10k nested loop (1e11
  compares); binning runs it as one equi join. Reports match count and
  wall time.

JSON-line output, mirroring tools/corpus_smoke.py.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from api_to_amt_data_lake_spark.operators.joins import (  # noqa: E402
    bloom_semi_join,
    range_bin_join,
)
from api_to_amt_data_lake_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("join_smoke")

    large = spark.range(n).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("payload"),
    ).localCheckpoint()
    large.count()
    small = spark.range(0, n, 100).select(F.col("id").alias("sk")) \
        .localCheckpoint()
    n_small = small.count()

    t0 = time.time()
    n_bloom = bloom_semi_join(large, small, "k", "sk").count()
    t_bloom = round(time.time() - t0, 2)
    t0 = time.time()
    n_pruned = bloom_semi_join(large, small, "k", "sk",
                               exact=False).count()
    t_pruned = round(time.time() - t0, 2)
    t0 = time.time()
    n_plain = large.join(small, F.col("k") == F.col("sk"),
                         "left_semi").count()
    t_plain = round(time.time() - t0, 2)
    # The 100 TB adversary: when the key set does NOT fit a broadcast
    # hash relation, the plain semi join exchanges the ENTIRE large
    # side. Force that shape (merge hint -> SortMergeJoin) to measure
    # what the bloom pass is actually up against.
    t0 = time.time()
    n_sm = large.join(small.hint("merge"), F.col("k") == F.col("sk"),
                      "left_semi").count()
    t_shuffle = round(time.time() - t0, 2)
    assert n_bloom == n_plain == n_sm, (n_bloom, n_plain, n_sm)
    print(json.dumps({
        "op": "bloom_semi_join", "n_large": n, "n_small": n_small,
        "matches": n_bloom, "bloom_survivors": n_pruned,
        "false_positive_rate": round((n_pruned - n_plain)
                                     / max(1, n - n_plain), 6),
        "sec_bloom": t_bloom, "sec_bloom_prune_only": t_pruned,
        "sec_plain_semi_broadcast": t_plain,
        "sec_plain_semi_shuffle": t_shuffle,
    }))

    points = spark.range(n).select(
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000)).cast("double"))
        .alias("p")).localCheckpoint()
    points.count()
    spans = spark.range(10_000).select(
        F.col("id").alias("span_id"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000))
         .cast("double")).alias("lo"),
    ).withColumn("hi", F.col("lo") + 100.0).localCheckpoint()
    n_spans = spans.count()
    t0 = time.time()
    n_matches = range_bin_join(points, spans, "p", "lo", "hi",
                               bin_width=64.0).count()
    t_range = round(time.time() - t0, 2)
    print(json.dumps({
        "op": "range_bin_join", "n_points": n, "n_spans": n_spans,
        "matches": n_matches, "sec": t_range,
        "nested_loop_compares_avoided": n * n_spans,
    }))


if __name__ == "__main__":
    main()
