"""Standalone fresh-JVM floors for the heavy bench tail (VERDICT r10
item 2 / note 2).

The light-to-heavy suite order fixed position debt for the sub-second
queries but moved it onto whatever runs LAST — the q95 ANN family
absorbed the accumulated GC/host debt (q95d read 1.52x across rounds
with zero code change). In-suite numbers for the heavy tail are
therefore position-noisy; cross-round regression claims need a
position-free floor.

This tool runs each heavy query in its OWN fresh JVM (one subprocess
per query — no suite neighbors, no inherited GC debt): one untimed
warm-up execution absorbs codegen/JIT/footer costs, then min of
N_TIMED=2 timed executions. Writes FLOORS_r{NN}.json at the repo root;
bench.py embeds it as the `floors` section of the round's bench
artifact. Adjudication rule (SCALE.md): a heavy query is only called
regressed if its FLOOR moved, floor-vs-floor.

Usage: python tools/heavy_floors.py [sf_dir] [--round N]
       (internal: --one <query> <sf_dir> runs a single query child)
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

HEAVY = [
    "q95f_rebuilt_index",
    "q99zb_fuzzy_join",
    "q95e_persisted_ivfpq",
    "q95d_sampled_ivfpq_recall",
    "q95i_adc_rerank",
]
N_TIMED = 2


def _run_one(name: str, sf_dir: str) -> None:
    from api_to_amt_data_lake_spark.plans import conformance
    from api_to_amt_data_lake_spark.session import get_spark

    spark = get_spark(f"floor-{name}")
    fn = conformance.QUERIES[name]
    fn(spark, sf_dir).count()  # warm-up: codegen/JIT/footers
    best = None
    for _ in range(N_TIMED):
        t0 = time.time()
        fn(spark, sf_dir).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"query": name, "floor_s": round(best, 3)}))


def main() -> None:
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        _run_one(sys.argv[i + 1], sys.argv[i + 2])
        return

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not \
        sys.argv[1].startswith("--") else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    nn = None
    if "--round" in sys.argv:
        nn = int(sys.argv[sys.argv.index("--round") + 1])
    if nn is None and (env := os.environ.get("SPARK_GRAFT_ROUND")):
        nn = int(env)
    if nn is None:
        rounds = [int(m.group(1)) for f in REPO.glob("BENCH_r*.json")
                  if (m := re.match(r"BENCH_r(\d+)\.json$", f.name))]
        nn = (max(rounds) + 1) if rounds else 0

    floors: dict[str, float] = {}
    for name in HEAVY:
        out = subprocess.run(
            [sys.executable, str(Path(__file__)), "--one", name,
             sf_dir],
            capture_output=True, text=True, timeout=1200)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith('{"query"')]
        if not line:
            print(f"# {name} FAILED:\n{out.stderr[-2000:]}",
                  file=sys.stderr)
            continue
        rec = json.loads(line[-1])
        floors[name] = rec["floor_s"]
        print(f"{name}: {rec['floor_s']} s (fresh JVM)", flush=True)

    artifact = {
        "metric": "heavy_query_floors",
        "method": f"fresh JVM per query; 1 warm-up + min of {N_TIMED}",
        "sf_dir": sf_dir,
        "floors": floors,
    }
    path = REPO / f"FLOORS_r{nn:02d}.json"
    path.write_text(json.dumps(artifact, indent=1) + "\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
