"""Fuzzy-join scale smoke: Ed-Join blocking at 10× the sf0.1 fixture.

Usage: python tools/fuzzy_smoke.py [n_names] [short]

Default mode synthesizes structured entity keys (the adversarial case
for q-gram blocking: a long shared prefix concentrates all
discriminating entropy in a few trailing digits) and times the
self-join at max_dist=1, recording candidate volume vs verified pairs
so the Σ posting² growth is measured, not assumed.

`short` mode (r8) stresses the OTHER adversary: strings BELOW the gram
budget (4–7 chars at q=3), which bypass gram blocking entirely and go
through the length-band route. Before r8 that route broadcast the short
stratum against the entire other side (n² pair generation + a
driver-sized broadcast); now work is Σ |band|² over width-(d+1) length
bands — for an all-short corpus that is still ~n²/bands pair
CANDIDATES by nature (two same-length short strings genuinely can't be
pruned by grams), but the candidates never materialize strings, the
verify is a codegen levenshtein over int-pair candidates, and no
broadcast of a full input ever happens. Mirrors
tools/corpus_smoke.py's JSON-line output.
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
    short = len(sys.argv) > 2 and sys.argv[2] == "short"
    spark = get_spark("fuzzy_smoke")
    if short:
        # 4-7 char digit strings: every row below the q=3 gram budget.
        name = F.lpad(
            F.pmod(F.xxhash64("id"), F.pow(F.lit(10), 4 + F.pmod(
                F.col("id"), F.lit(4))).cast("long")).cast("string"),
            4, "0")
    else:
        name = F.concat(F.lit("Customer#"),
                        F.lpad(F.col("id").cast("string"), 9, "0"))
    names = spark.range(n).select(
        F.col("id").alias("nid"), name.alias("name")).localCheckpoint()
    names.count()
    t0 = time.time()
    pairs = fuzzy_join(names, names, "nid", "nid", "name", "name",
                       max_dist=1, q=3) \
        .filter(F.col("nid_l") < F.col("nid_r"))
    n_pairs = pairs.count()
    dt = round(time.time() - t0, 2)
    print(json.dumps({"n_names": n, "mode": "short" if short else "keys",
                      "pairs": n_pairs, "sec": dt}))


if __name__ == "__main__":
    main()
