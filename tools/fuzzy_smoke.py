"""Fuzzy-join scale smoke: Ed-Join blocking at 10× the sf0.1 fixture.

Usage: python tools/fuzzy_smoke.py [n_names]   (default 150_000)

Synthesizes structured entity keys (the adversarial case for q-gram
blocking: a long shared prefix concentrates all discriminating entropy
in a few trailing digits) and times the self-join at max_dist=1,
recording candidate volume vs verified pairs so the Σ posting² growth
is measured, not assumed. Mirrors tools/corpus_smoke.py's JSON-line
output.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from api_to_amt_data_lake_spark.operators.fuzzy import fuzzy_join  # noqa: E402
from api_to_amt_data_lake_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    spark = get_spark("fuzzy_smoke")
    names = spark.range(n).select(
        F.col("id").alias("nid"),
        F.concat(F.lit("Customer#"),
                 F.lpad(F.col("id").cast("string"), 9, "0")).alias("name"),
    ).localCheckpoint()
    names.count()
    t0 = time.time()
    pairs = fuzzy_join(names, names, "nid", "nid", "name", "name",
                       max_dist=1, q=3) \
        .filter(F.col("nid_l") < F.col("nid_r"))
    n_pairs = pairs.count()
    dt = round(time.time() - t0, 2)
    print(json.dumps({"n_names": n, "pairs": n_pairs, "sec": dt}))


if __name__ == "__main__":
    main()
