"""LLM training-data curation pipeline, end to end.

The AMT pipeline has `tests/test_pipeline_e2e.py`; this is its
LLM-data sibling — the capstone proof that the operator library
COMPOSES: a raw document corpus flows through exact dedup → near-dup
pruning (MinHash/LSH + connected components) → quality filtering
(Gopher battery) → per-domain quota (salted domain cap) → epoch
shuffle → chunking → sequence packing → WebDataset export, and reads
back byte-faithful. Each stage asserts the invariant a pipeline owner
would actually check, so a regression in any operator's contract
breaks here even if its unit tests still pass in isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators.chunking import chunk_spans
from api_to_amt_data_lake_spark.operators.dedup import (
    connected_components,
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
)
from api_to_amt_data_lake_spark.operators.packing import pack_offsets
from api_to_amt_data_lake_spark.operators.sampling import (
    deterministic_shuffle,
    domain_cap,
)
from api_to_amt_data_lake_spark.operators.text import gopher_flags
from api_to_amt_data_lake_spark.sources.webdataset import (
    export_webdataset,
    read_webdataset,
)


def _corpus(spark, n=400):
    """Synthetic corpus with planted exact dups, near dups, junk docs,
    and one hot domain. Word choice is hashed per (doc, position) —
    NOT a rotation of a shared cycle, which would make most docs
    identical or near-identical and collapse the whole corpus into one
    LSH component (the corpus_smoke lesson)."""
    import hashlib

    words = ("the quick brown fox jumps over a lazy dog while data "
             "flows through spark pipelines at scale with care").split()

    def body_of(cid: int) -> str:
        out = []
        for j in range(40):
            h = int(hashlib.md5(f"{cid}:{j}".encode()).hexdigest()[:6],
                    16)
            w = words[h % len(words)]
            # ~1 in 5 words stays bare so the Gopher stopword floor has
            # real stopwords to count; the rest carry digit suffixes so
            # shingles stay distinct across docs.
            out.append(w if h % 5 == 0 else w + str(h % 7))
        return " ".join(out)

    rows = []
    for i in range(n):
        # Upper-half plants point back at a real earlier doc's content:
        # i%10==7 duplicates it exactly, i%10==8 appends one word.
        planted = i % 10 in (7, 8) and i >= n // 2
        cid = i - n // 2 if planted else i
        body = body_of(cid)
        if i % 10 == 8 and planted:               # near dup: one word on
            body += " extra"
        if i % 17 == 3:                           # junk: too short
            body = "tiny doc"
        dom = "hot.example" if i % 2 == 0 else f"site{i % 7}.example"
        rows.append((i, dom, body))
    return spark.createDataFrame(rows, ["doc_id", "domain", "text"])


def test_curation_pipeline_end_to_end(spark, tmp_path):
    corpus = _corpus(spark).localCheckpoint()
    n0 = corpus.count()

    # 1. exact dedup — keep the lowest-id copy of identical content
    keepers = exact_dedup_groups(corpus, "doc_id", "text") \
        .select(F.col("keeper_id").alias("doc_id"))
    stage1 = corpus.join(keepers, "doc_id")
    n1 = stage1.count()
    assert n1 < n0  # planted exact dups removed
    assert stage1.select("text").distinct().count() == n1

    # 2. near-dup pruning: LSH pairs -> components -> keep one per
    # cluster (the component representative = min id)
    sig = minhash_signatures(stage1, "doc_id", "text",
                             num_hashes=8, shingle_n=3)
    pairs = lsh_candidate_pairs(sig, "doc_id", num_hashes=8, bands=4)
    comp = connected_components(pairs, "id_a", "id_b")
    drop = comp.filter(F.col("id") != F.col("cluster_id")) \
        .select(F.col("id").alias("doc_id"))
    stage2 = stage1.join(drop, "doc_id", "left_anti").localCheckpoint()
    n2 = stage2.count()
    assert n2 < n1  # planted near dups pruned

    # 3. quality filter — junk docs fail the Gopher word-count floor
    flags = gopher_flags(F.col("text"), min_words=30, min_stopwords=1)
    stage3 = stage2.filter(flags["ok_all"])
    n3 = stage3.count()
    assert n3 < n2
    assert stage3.filter(F.col("text") == "tiny doc").count() == 0

    # 4. per-domain quota — the hot domain is capped, small ones whole
    cap = 20
    stage4 = domain_cap(stage3, "domain", "doc_id", cap=cap, seed=7)
    per_dom = {r["domain"]: r["n"] for r in stage4.groupBy("domain")
               .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_dom["hot.example"] == cap
    assert all(v <= cap for v in per_dom.values())

    # 5. epoch shuffle — dense, deterministic global positions
    ordered = deterministic_shuffle(stage4.select("doc_id", "text"),
                                    "doc_id", seed=1)
    n4 = ordered.count()
    pos = sorted(r["shuffle_pos"] for r in ordered.collect())
    assert pos == list(range(n4))

    # 6. chunk + pack — token-budgeted training windows
    chunks = chunk_spans(stage4, "text", "doc_id",
                         chunk_tokens=16, stride=16)
    packed = pack_offsets(
        chunks.select(
            (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("cid"),
            F.col("n_tokens").alias("_n")),
        "cid", F.col("_n"), window_tokens=64)
    rowsp = sorted(packed.collect(), key=lambda r: r["cid"])
    # Offsets are EXACTLY the exclusive prefix sums in id order (dense
    # concat packing — no gap, no overlap), and every bin_id is its
    # chunk's start window; together these pin the packing contract.
    run = 0
    for r in rowsp:
        assert r["start_offset"] == run, (r["cid"], r["start_offset"], run)
        assert r["bin_id"] == r["start_offset"] // 64
        run += r["n_tokens"]
    assert run == sum(r["n_tokens"] for r in rowsp) and run > 0

    # 7. WebDataset export of the curated docs, byte-faithful read-back
    out = str(tmp_path / "wds")
    dense = deterministic_shuffle(stage4.select("doc_id", "text"),
                                  "doc_id", seed=2) \
        .select(F.col("shuffle_pos").alias("sid"), "text")
    export_webdataset(dense, out, "sid", {"txt": "text"},
                      shard_size=50).collect()
    back = read_webdataset(spark, out).filter(F.col("ext") == "txt")
    assert back.count() == n4
    want = {(r["sid"], r["text"]) for r in dense.collect()}
    got = {(r["id"], bytes(r["content"]).decode())
           for r in back.collect()}
    assert got == want
