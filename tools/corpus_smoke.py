"""Corpus-pipeline scale smoke: run the LLM-data operators over a
synthetic corpus orders of magnitude beyond the sf0.1 fixtures.

Usage: python tools/corpus_smoke.py [n_docs]   (default 1_000_000)

The corpus is generated DISTRIBUTED (spark.range + expression-built
text — no driver-side loops, no Python row funcs), with planted
structure so the operators have real work:
- 10% of documents are exact duplicates of an earlier document,
- a further 10% are near-duplicates (one word appended),
- text is ~40 words drawn deterministically from a 50-word vocabulary.

Stages timed (each is the registered operator, not a re-implementation):
  gen        materialize the corpus (noop-cached baseline scan cost)
  exact      exact_dedup_groups — one md5 shuffle
  minhash    MinHash signatures + LSH candidate pairs
  index_build / increment — incremental LSH maintenance: index the
             first 90%, then probe a 10% batch (steady-state daily cost)
  gopher     Gopher rule battery + per-source pass counts
  chunks     sliding-window chunking (shuffle-free explode)
  cms        count-min sketch build (bounded-state shuffle)
  sample     A-ES weighted sample top-k
  domain_cap two-phase salted per-domain quota (cap=1000/source)
  grid_quantiles per-source fixed-grid length quantiles (mergeable
             binned-count partials)
  psi / pmi / gini / type_growth / zipf — corpus-distribution stats
             (operators/corpus.py): PSI drift bins, collocation PMI,
             Lorenz/Gini/HHI concentration, Heaps type growth, Zipf fit

Prints one JSON line with per-stage seconds and row counts, mirroring
`tools/scale_smoke.py` for the AMT view pipeline.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from api_to_amt_data_lake_spark.operators.chunking import chunk_spans  # noqa: E402
from api_to_amt_data_lake_spark.operators.dedup import (  # noqa: E402
    exact_dedup_groups,
    incremental_lsh_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
)
from api_to_amt_data_lake_spark.operators.sampling import (  # noqa: E402
    weighted_sample_keys,
)
from api_to_amt_data_lake_spark.operators.sketches import cms_build  # noqa: E402
from api_to_amt_data_lake_spark.operators.text import gopher_flags  # noqa: E402
from api_to_amt_data_lake_spark.session import get_spark  # noqa: E402

VOCAB = [
    "the", "of", "and", "to", "a", "in", "table", "row", "scan", "join",
    "hash", "merge", "sort", "filter", "group", "agg", "window", "stream",
    "batch", "key", "value", "column", "vector", "index", "query", "plan",
    "stage", "task", "shuffle", "spill", "cache", "disk", "memory", "cpu",
    "byte", "page", "block", "file", "part", "bucket", "range", "limit",
    "order", "union", "except", "data", "lake", "gold", "silver", "spark",
]


def build_corpus(spark, n: int):
    """(doc_id, source, text, n_chars) with planted exact/near dups."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string"))
         .alias("source"),
        # 10% exact dups + 10% near dups in the upper half point back at
        # a DISTINCT earlier doc's content id (id - n/2, only where that
        # is a real earlier id) — dup groups stay size 2/3. Clamping all
        # low ids to one cid instead creates a single n/10-member group
        # whose LSH bucket explodes quadratically (measured: the 1M run
        # never finished).
        F.when((F.col("id") % 10 == 7) & (F.col("id") >= n // 2),
               F.col("id") - F.lit(n // 2))
         .when((F.col("id") % 10 == 8) & (F.col("id") >= n // 2),
               F.col("id") - F.lit(n // 2))
         .otherwise(F.col("id")).alias("_cid"),
    )
    # Hash (cid, i) as a pair — NOT cid*i: the product aliases across
    # documents (cid=2,i=20 == cid=4,i=10), which correlates shingles
    # corpus-wide and blows LSH buckets up quadratically (measured 50M
    # candidate pairs from 100k docs). The pathological hot-bucket case
    # is covered deliberately by the AQE skew test, not the smoke.
    # ~500 distinct surface tokens (base word + digit suffix): with only
    # the 50 bare words, every trigram is shared by hundreds of docs at
    # 1M scale, the globally-minimal shingle hashes land in hundreds of
    # documents each, and MinHash buckets grow superlinearly (measured
    # 4.5M candidate pairs / 210 s at 1M docs). Real corpora have 10k+
    # word forms; 500 keeps trigram collisions negligible so candidate
    # pairs ≈ the planted duplicates.
    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.concat(
            F.element_at(
                vocab,
                (F.pmod(F.xxhash64(F.col("_cid"), i), F.lit(50)) + 1)
                .cast("int")),
            F.pmod(F.xxhash64(i, F.col("_cid")), F.lit(10)).cast("string")),
    )
    text = F.when(
        F.col("doc_id") % 10 == 8,  # near-dup: one extra word
        F.concat(F.array_join(words, " "), F.lit(" extra")),
    ).otherwise(F.array_join(words, " "))
    return base.select(
        "doc_id", "source", text.alias("text"),
    ).withColumn("n_chars", F.length("text").cast("long"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("corpus_smoke")
    t: dict[str, float] = {}
    rows: dict[str, int] = {}

    t0 = time.time()
    corpus = build_corpus(spark, n)
    corpus = corpus.localCheckpoint()  # pin: stages measure their own cost
    rows["gen"] = corpus.count()
    t["gen"] = round(time.time() - t0, 2)

    t0 = time.time()
    rows["exact"] = exact_dedup_groups(corpus, "doc_id", "text").count()
    t["exact"] = round(time.time() - t0, 2)

    t0 = time.time()
    sig = minhash_signatures(corpus, "doc_id", "text",
                             num_hashes=8, shingle_n=3)
    rows["minhash"] = lsh_candidate_pairs(sig, "doc_id",
                                          num_hashes=8, bands=4).count()
    t["minhash"] = round(time.time() - t0, 2)

    # Incremental maintenance: the last 10% of doc ids arrive as a new
    # crawl batch against an already-built signature index. Steady-state
    # daily cost = increment signature build + broadcast band probe —
    # compare t["increment"] against t["minhash"] (the full pairing).
    t0 = time.time()
    esig = minhash_signatures(
        corpus.filter(F.col("doc_id") < int(n * 0.9)), "doc_id", "text",
        num_hashes=8, shingle_n=3).localCheckpoint()
    t["index_build"] = round(time.time() - t0, 2)
    t0 = time.time()
    nsig = minhash_signatures(
        corpus.filter(F.col("doc_id") >= int(n * 0.9)), "doc_id", "text",
        num_hashes=8, shingle_n=3)
    rows["increment"] = incremental_lsh_pairs(
        esig, nsig, "doc_id", num_hashes=8, bands=4).count()
    t["increment"] = round(time.time() - t0, 2)

    t0 = time.time()
    flags = gopher_flags(F.col("text"), min_words=30, min_stopwords=1)
    rows["gopher"] = (
        corpus.select("source", flags["ok_all"].cast("int").alias("ok"))
        .groupBy("source").agg(F.sum("ok")).count())
    t["gopher"] = round(time.time() - t0, 2)

    t0 = time.time()
    rows["chunks"] = chunk_spans(corpus, "text", "doc_id",
                                 chunk_tokens=64, stride=32).count()
    t["chunks"] = round(time.time() - t0, 2)

    t0 = time.time()
    rows["cms"] = cms_build(corpus, "text", depth=4, hex_chars=2).count()
    t["cms"] = round(time.time() - t0, 2)

    t0 = time.time()
    rows["sample"] = (
        weighted_sample_keys(corpus, "doc_id", "n_chars", seed=7)
        .orderBy(F.desc("_wkey")).limit(1000).count())
    t["sample"] = round(time.time() - t0, 2)

    # DSIR: target = one source's docs (5% of the corpus); both bucket
    # tables collapse to <=256 rows before the broadcast-join scoring
    # pass, so the stage should track the corpus scan cost, not n^2.
    t0 = time.time()
    from api_to_amt_data_lake_spark.operators.sampling import (
        dsir_logweights,
    )
    rows["dsir"] = dsir_logweights(
        corpus, corpus.filter(F.col("source") == "src3"),
        "text", "doc_id").count()
    t["dsir"] = round(time.time() - t0, 2)

    t0 = time.time()
    from api_to_amt_data_lake_spark.operators.sampling import domain_cap
    rows["domain_cap"] = domain_cap(
        corpus.select("doc_id", "source"), "source", "doc_id",
        cap=1000).count()
    t["domain_cap"] = round(time.time() - t0, 2)

    t0 = time.time()
    from api_to_amt_data_lake_spark.operators.sketches import (
        grid_quantiles,
        grid_sketch,
    )
    rows["grid_quantiles"] = grid_quantiles(
        grid_sketch(corpus, ["source"], "n_chars", 10),
        ["source"], 10).count()
    t["grid_quantiles"] = round(time.time() - t0, 2)

    # Unbounded-domain variant: geometric bins over the same column —
    # same bounded-state shape, no [lo, hi] needed.
    t0 = time.time()
    from api_to_amt_data_lake_spark.operators.sketches import (
        log_grid_quantiles,
        log_grid_sketch,
    )
    rows["log_grid"] = log_grid_quantiles(
        log_grid_sketch(corpus, ["source"], "n_chars", growth=1.1),
        ["source"], growth=1.1).count()
    t["log_grid"] = round(time.time() - t0, 2)

    # MERGE-splice store: init the snapshot with 99% of the corpus,
    # then fold a 100-doc CDC batch. The bucketed store (n_buckets=512)
    # rewrites only the batch's touched buckets (~90) and hard-links
    # the rest; the plain store rewrites all n rows. The two fold
    # timings are the steady-state streaming cost comparison.
    import shutil
    import tempfile

    from api_to_amt_data_lake_spark.streaming.sink import fold_batch
    slim = corpus.select("doc_id", "source", "n_chars")
    init = slim.filter(F.col("doc_id") < int(n * 0.99))
    inc = slim.filter(F.col("doc_id") >= n - 100)
    for mode, nb in (("plain", None), ("splice", 512)):
        root = tempfile.mkdtemp(prefix=f"merge_store_{mode}_")
        t0 = time.time()
        fold_batch(spark, init, 0, root, 2024, "docs", "doc_id",
                   "n_chars", n_buckets=nb)
        t[f"store_init_{mode}"] = round(time.time() - t0, 2)
        t0 = time.time()
        fold_batch(spark, inc, 1, root, 2024, "docs", "doc_id",
                   "n_chars", n_buckets=nb)
        t[f"store_fold_{mode}"] = round(time.time() - t0, 2)
        rows[f"store_fold_{mode}"] = 100
        shutil.rmtree(root, ignore_errors=True)

    # CCNet-style LM quality scoring: train the add-k bigram model on
    # the 10% reference slice, score the WHOLE corpus. The stage should
    # track two corpus scans + one bigram-keyed shuffle join — never
    # vocab² (the synthetic 50-word vocabulary keeps the count tables
    # broadcast-tiny, which is also the production shape: count tables
    # grow with observed bigrams, not corpus rows).
    t0 = time.time()
    from api_to_amt_data_lake_spark.operators.text import (
        bigram_lm_perplexity,
    )
    rows["perplexity"] = bigram_lm_perplexity(
        corpus, "doc_id", "text",
        reference=F.col("doc_id") % 10 == 0).count()
    t["perplexity"] = round(time.time() - t0, 2)

    # Corpus-distribution stats (operators/corpus.py, round 11): PSI
    # and type-growth collapse to <=10 rows before any window; the PMI
    # joins run on the min_count survivors; gini/zipf windows are
    # bounded by source/vocab cardinality. Each stage should track one
    # or two corpus scans.
    from api_to_amt_data_lake_spark.operators.corpus import (
        bigram_pmi,
        lorenz_concentration,
        ngram_type_growth,
        psi_drift,
        zipf_fit,
    )

    t0 = time.time()
    rows["psi"] = psi_drift(
        corpus.withColumn("is_cur", F.col("doc_id") % 2 == 1),
        "n_chars", "is_cur").count()
    t["psi"] = round(time.time() - t0, 2)

    t0 = time.time()
    rows["pmi"] = bigram_pmi(corpus, "text", min_count=5).count()
    t["pmi"] = round(time.time() - t0, 2)

    t0 = time.time()
    rows["gini"] = lorenz_concentration(corpus, "source").count()
    t["gini"] = round(time.time() - t0, 2)

    t0 = time.time()
    rows["type_growth"] = ngram_type_growth(
        corpus, "doc_id", "text").count()
    t["type_growth"] = round(time.time() - t0, 2)

    t0 = time.time()
    rows["zipf"] = zipf_fit(corpus, "text", top_n=1000).count()
    t["zipf"] = round(time.time() - t0, 2)

    # Round-11 wave 2: dispersion/drift/richness/CI/overlap. Each is
    # one or two corpus scans plus aggregation on vocabulary- or
    # source-bounded tables; bootstrap is deliberately 16x one scan
    # (the replicate explode) with partial aggregation before the
    # (group, replicate) shuffle.
    from api_to_amt_data_lake_spark.operators.aggregates import (
        trimmed_winsorized_mean,
    )
    from api_to_amt_data_lake_spark.operators.corpus import (
        js_divergence,
        ks_drift,
        vocab_richness,
        word_dispersion,
    )
    from api_to_amt_data_lake_spark.operators.evaluation import (
        bootstrap_mean_ci,
    )
    from api_to_amt_data_lake_spark.operators.sketches import (
        kmv_jaccard_matrix,
    )

    t0 = time.time()
    rows["dispersion"] = word_dispersion(
        corpus, "source", "text", min_count=5).count()
    t["dispersion"] = round(time.time() - t0, 2)

    t0 = time.time()
    # slice flag alternates WITHIN each source (source = id % 20, so
    # id parity is constant per source; id % 40 >= 20 flips per block)
    rows["ks"] = ks_drift(
        corpus.select("source", "n_chars",
                      (F.col("doc_id") % 40 >= 20).alias("is_cur")),
        ["source"], "n_chars", "is_cur").count()
    t["ks"] = round(time.time() - t0, 2)

    t0 = time.time()
    jsd_in = corpus.select(
        "source", (F.col("doc_id") % 40 >= 20).alias("is_cur"),
        F.explode(F.split(F.trim("text"), " ")).alias("item"))
    rows["jsd"] = js_divergence(
        jsd_in, ["source"], "item", "is_cur").count()
    t["jsd"] = round(time.time() - t0, 2)

    t0 = time.time()
    rows["richness"] = vocab_richness(corpus, ["source"], "text").count()
    t["richness"] = round(time.time() - t0, 2)

    t0 = time.time()
    rows["trimmed"] = trimmed_winsorized_mean(
        corpus, "source", "n_chars", trim=0.1).count()
    t["trimmed"] = round(time.time() - t0, 2)

    t0 = time.time()
    rows["bootstrap"] = bootstrap_mean_ci(
        corpus, ["source"], "n_chars", "doc_id", n_boot=16).count()
    t["bootstrap"] = round(time.time() - t0, 2)

    t0 = time.time()
    toks = corpus.select(
        "source", F.explode(F.split(F.trim("text"), " ")).alias("w"))
    rows["overlap"] = kmv_jaccard_matrix(
        toks, "source", "w", k=128).count()
    t["overlap"] = round(time.time() - t0, 2)

    print(json.dumps({"n_docs": n, "sec": t, "rows": rows,
                      "total_sec": round(sum(t.values()), 2)}))


if __name__ == "__main__":
    main()
