"""ANN trainer scale smoke: sampled-fit vs full-fit IVFPQ at volume.

Usage: python tools/ann_smoke.py [n_vectors] [dim] [sample_frac]

Synthesizes n deterministic vectors (hash-derived, no parquet needed),
then times `ivfpq_fit` with the full-corpus trainers vs the
`sample_frac` trainers (VERDICT r4 item 2 / "What's wrong" #1: every
Lloyd's iteration re-scans its training frame, so the sampled fit
bounds iteration cost while assignment/encode stay full-corpus). Both
indexes are then searched with the same probes and their ADC top-3
overlap is reported — the sanity check that the cheaper fit still
builds the same index family. Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from api_to_amt_data_lake_spark.operators.similarity import (  # noqa: E402
    ivfpq_fit,
    ivfpq_topk,
)
from api_to_amt_data_lake_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.01
    spark = get_spark("ann_smoke")

    # Deterministic synthetic corpus: element (i, j) from xxhash64 —
    # generated distributed, never collected.
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000))
                   / F.lit(1000.0)))
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding"))
    corpus = corpus.localCheckpoint()  # pin: time the trainers, not gen

    out: dict[str, object] = {"n_vectors": n, "dim": dim,
                              "sample_frac": frac}
    indexes = {}
    for label, sf in (("full_fit", None), ("sampled_fit", frac)):
        t0 = time.time()
        coarse, book, codes = ivfpq_fit(
            corpus, "vec_id", "embedding", kc=8, coarse_iters=2,
            m=4, k=8, iters=2, sample_frac=sf)
        codes = codes.localCheckpoint()  # materialize the encode pass
        n_codes = codes.count()
        out[f"{label}_sec"] = round(time.time() - t0, 1)
        out[f"{label}_codes"] = n_codes
        indexes[label] = (coarse, book, codes)
        print(f"# {label}: {out[f'{label}_sec']}s "
              f"({n_codes} code rows)", file=sys.stderr)

    # Index-quality aggregate: mean ADC distance of each index's top-3.
    # (Exact top-3 overlap is NOT the right metric on hash-uniform
    # vectors — distance concentration makes the true top-3 a near-tie
    # lottery; per-row accuracy contracts live in q95c/q95d and the
    # clustered-fixture recall test. A garbage sampled codebook would
    # show up here as blown-up reconstruction/ADC distances.)
    q = corpus.filter(F.col("vec_id") < 20)
    for label, (coarse, book, codes) in indexes.items():
        top = ivfpq_topk(q, coarse, book, codes, "vec_id",
                         "embedding", m=4, k=3, nprobe=2)
        mean_adc = top.agg(F.avg("adc_dist")).collect()[0][0]
        out[f"{label}_mean_adc_top3"] = round(float(mean_adc), 4)
    ratio = out["sampled_fit_mean_adc_top3"] / \
        max(out["full_fit_mean_adc_top3"], 1e-9)
    out["sampled_vs_full_adc_ratio"] = round(ratio, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
