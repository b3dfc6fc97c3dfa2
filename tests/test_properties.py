"""Property-based tests (hypothesis) for the expression library.

Each property batches its generated examples into ONE Spark job
(createDataFrame → collect) and compares elementwise against a pure-Python
model of the reference semantics (`pandasWrapper.py` /
`descriptor_mapping.py` string ops) — so a run is a handful of Spark jobs,
not one per example.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.descriptors import (
    descriptor_code_value,
    descriptor_name,
    ref_from_href,
)
from api_to_amt_data_lake_spark.functions.keys import sk_concat, sk_concat_strict
from api_to_amt_data_lake_spark.functions.nulls import (
    empty_to_null,
    null_to_empty,
    replace_null_empty,
)

SETTINGS = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# Printable-ish strings without surrogates; '#', '/', '-' included so the
# parsing functions hit their separators often.
text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",),
                           exclude_characters="\x00"),
    max_size=40,
)
opt_text = st.one_of(st.none(), text)


def _run_unary(spark, values, expr_fn):
    """Evaluate expr_fn(col) over one batch; return list of results."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)],
        T.StructType([
            T.StructField("i", T.IntegerType()),
            T.StructField("v", T.StringType()),
        ]),
    )
    rows = df.select("i", expr_fn(F.col("v")).alias("r")).collect()
    return [r.r for r in sorted(rows, key=lambda r: r.i)]


class TestDescriptorParsing:
    """F1-F3: pure string splits, python str.split is the model."""

    @SETTINGS
    @given(st.lists(text, min_size=1, max_size=60))
    def test_code_value_matches_split(self, spark, vals):
        got = _run_unary(spark, vals, descriptor_code_value)
        want = [v.split("#")[-1] for v in vals]
        assert got == want

    @SETTINGS
    @given(st.lists(text, min_size=1, max_size=60))
    def test_descriptor_name_matches_split(self, spark, vals):
        got = _run_unary(spark, vals, descriptor_name)
        # reference: everything before the last '#', then last '/' segment
        want = ["#".join(v.split("#")[:-1] or [v]).split("/")[-1] for v in vals]
        assert got == want

    @SETTINGS
    @given(st.lists(text, min_size=1, max_size=60))
    def test_ref_from_href_matches_split(self, spark, vals):
        got = _run_unary(spark, vals, ref_from_href)
        want = [v.split("/")[-1] for v in vals]
        assert got == want


class TestDateKey:
    """F7 `to_datetime_key`: str(value).replace('-','')[:8]."""

    @SETTINGS
    @given(st.lists(st.one_of(
        st.dates().map(lambda d: d.isoformat()),
        text,
    ), min_size=1, max_size=60))
    def test_matches_python_model(self, spark, vals):
        got = _run_unary(spark, vals, date_key)
        want = [v.replace("-", "")[:8] for v in vals]
        assert got == want

    @SETTINGS
    @given(st.lists(st.dates(), min_size=1, max_size=60))
    def test_lexicographic_equals_chronological(self, spark, dates):
        keys = _run_unary(spark, [d.isoformat() for d in dates], date_key)
        pairs = sorted(zip(keys, dates))
        assert [d for _, d in pairs] == sorted(dates)


class TestKeyConcat:
    """F5: sk_concat (null→'') vs sk_concat_strict (null propagates)."""

    @SETTINGS
    @given(st.lists(st.tuples(opt_text, opt_text), min_size=1, max_size=60))
    def test_concat_models(self, spark, pairs):
        df = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(pairs)],
            T.StructType([
                T.StructField("i", T.IntegerType()),
                T.StructField("a", T.StringType()),
                T.StructField("b", T.StringType()),
            ]),
        )
        rows = df.select(
            "i",
            sk_concat("a", "b").alias("loose"),
            sk_concat_strict("a", "b").alias("strict"),
        ).collect()
        rows.sort(key=lambda r: r.i)
        for r, (a, b) in zip(rows, pairs):
            assert r.loose == f"{a or ''}-{b or ''}"
            if a is None or b is None:
                assert r.strict is None
            else:
                assert r.strict == f"{a}-{b}"


class TestNullDialect:
    """F11: ''/null collapse helpers against their python models."""

    @SETTINGS
    @given(st.lists(opt_text, min_size=1, max_size=60))
    def test_roundtrip_and_fill(self, spark, vals):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)],
            T.StructType([
                T.StructField("i", T.IntegerType()),
                T.StructField("v", T.StringType()),
            ]),
        )
        rows = df.select(
            "i",
            null_to_empty("v").alias("ne"),
            empty_to_null("v").alias("en"),
            replace_null_empty("v", "X").alias("rf"),
        ).collect()
        rows.sort(key=lambda r: r.i)
        for r, v in zip(rows, vals):
            assert r.ne == (v if v is not None else "")
            assert r.en == (v if v else None)
            assert r.rf == (v if v not in (None, "") else "X")


class TestConnectedComponents:
    @SETTINGS
    @given(st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(
            lambda e: e[0] != e[1]),
        min_size=1, max_size=12))
    def test_matches_union_find(self, spark, edges):
        from api_to_amt_data_lake_spark.operators.dedup import (
            connected_components,
        )

        # Reference: plain union-find with min-id root labeling.
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {n: find(n) for n in parent}

        df = spark.createDataFrame(
            [(a, b) for a, b in edges], "id_a long, id_b long")
        got = {r["id"]: r["cluster_id"]
               for r in connected_components(df).collect()}
        assert got == expected


class TestUpsertLatest:
    """upsert_latest == a dict fold keeping max (version, is_update)."""

    @SETTINGS
    @given(
        base=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 5)),
                      max_size=12, unique_by=lambda t: t[0]),
        updates=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 5)),
                         max_size=12, unique_by=lambda t: t[0]),
    )
    def test_matches_dict_fold(self, spark, base, updates):
        from api_to_amt_data_lake_spark.operators.merge import upsert_latest

        model: dict[int, tuple] = {}
        for k, v in base:
            model[k] = (v, 0, f"b{k}v{v}")
        for k, v in updates:
            # newest version wins; ties go to the update (_src=1)
            if k not in model or (v, 1) >= (model[k][0], model[k][1]):
                model[k] = (v, 1, f"u{k}v{v}")
        expected = {(k, v[0], v[2]) for k, v in model.items()}

        bdf = spark.createDataFrame(
            [(k, v, f"b{k}v{v}") for k, v in base],
            "id long, ver long, payload string")
        udf_ = spark.createDataFrame(
            [(k, v, f"u{k}v{v}") for k, v in updates],
            "id long, ver long, payload string")
        got = {(r["id"], r["ver"], r["payload"])
               for r in upsert_latest(bdf, udf_, ["id"],
                                      version_col="ver").collect()}
        assert got == expected


class TestHeaderParsers:
    """Round-trip: struct-built headers parse back to their parameters."""

    @SETTINGS
    @given(w=st.integers(1, 60_000), h=st.integers(1, 60_000))
    def test_png_gif_roundtrip(self, w, h):
        from tests.test_multimodal_decode import gif_bytes, png_bytes

        from api_to_amt_data_lake_spark.operators.multimodal import (
            parse_image_header,
        )

        assert parse_image_header(png_bytes(w, h)) == ("png", w, h, 3)
        if w < 65_536 and h < 65_536:  # GIF dims are u16
            assert parse_image_header(gif_bytes(w, h)) == ("gif", w, h, 3)

    @SETTINGS
    @given(rate=st.integers(1, 192_000), n=st.integers(0, 500),
           ch=st.integers(1, 8))
    def test_wav_roundtrip(self, rate, n, ch):
        import numpy as np

        from tests.test_multimodal_decode import wav_bytes

        from api_to_amt_data_lake_spark.operators.multimodal import (
            parse_wav_header,
        )

        blob = wav_bytes(rate, np.zeros(n * ch, dtype=np.int64), channels=ch)
        assert parse_wav_header(blob) == (rate, ch, 16, n)

    @SETTINGS
    @given(raw=st.binary(max_size=200))
    def test_parsers_never_crash_on_junk(self, raw):
        from api_to_amt_data_lake_spark.operators.multimodal import (
            parse_image_header,
            parse_wav_header,
        )

        parse_image_header(raw)   # may return None; must not raise
        parse_wav_header(raw)


class TestChunkingProperties:
    """chunk_spans: pure-Python model comparison + coverage invariants."""

    @SETTINGS
    @given(
        st.lists(st.integers(min_value=0, max_value=300), min_size=1,
                 max_size=8),
        st.integers(min_value=2, max_value=16),
        st.integers(min_value=1, max_value=16),
    )
    def test_chunk_count_and_tail_coverage(self, spark, doc_lens, chunk, stride):
        from api_to_amt_data_lake_spark.operators.chunking import chunk_spans
        import math

        stride = min(stride, chunk)  # stride > chunk would skip tokens
        rows = [(i, " ".join(f"t{j}" for j in range(n)) if n else "")
                for i, n in enumerate(doc_lens)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = chunk_spans(df, "text", "doc_id",
                          chunk_tokens=chunk, stride=stride).collect()
        by_doc: dict[int, list] = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        for i, n in enumerate(doc_lens):
            n_eff = max(n, 1)  # empty text still splits to one '' token
            expect = 1 + math.ceil(max(n_eff - chunk, 0) / stride)
            chunks = sorted(by_doc[i], key=lambda r: r.chunk_idx)
            assert len(chunks) == expect
            # last window reaches the final token; all windows non-empty
            last = chunks[-1]
            assert last.chunk_idx * stride + last.n_tokens == n_eff
            assert all(c.n_tokens >= 1 for c in chunks)
            # full coverage: windows tile [0, n) without gaps
            covered = set()
            for c in chunks:
                start = c.chunk_idx * stride
                covered.update(range(start, start + c.n_tokens))
            assert covered == set(range(n_eff))


class TestCmsProperties:
    """Count-min sketch vs exact counts on random corpora."""

    @SETTINGS
    @given(st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=30),
        min_size=1, max_size=6,
    ))
    def test_estimate_bounds(self, spark, docs):
        from collections import Counter
        from api_to_amt_data_lake_spark.operators.sketches import (
            cms_build, cms_estimate)

        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        sketch = cms_build(df, "text", depth=3, hex_chars=2)
        exact = Counter(t for toks in docs for t in toks)
        probes = spark.createDataFrame(
            [(t,) for t in exact], "tok string")
        est = {r.tok: r.est for r in
               cms_estimate(sketch, probes, depth=3, hex_chars=2).collect()}
        total = sum(exact.values())
        for tok, n in exact.items():
            assert est[tok] >= n          # never underestimates
            assert est[tok] <= total      # cell sum can't exceed stream


@given(st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 1000)),
    min_size=0, max_size=40,
))
@SETTINGS
def test_exclusive_prefix_sums_matches_python_model(spark, rows):
    """smallframe.exclusive_prefix_sums == a plain Python running total
    over keys sorted ascending (and descending), for arbitrary keyed
    count frames — including empty input and single-key frames."""
    from api_to_amt_data_lake_spark.operators.smallframe import (
        exclusive_prefix_sums,
    )

    agg: dict[int, int] = {}
    for k, v in rows:
        agg[k] = agg.get(k, 0) + v
    df = spark.createDataFrame(
        [(k, v) for k, v in agg.items()], "k int, cnt long") \
        if agg else spark.createDataFrame([], "k int, cnt long")
    for desc in (False, True):
        got = {r["k"]: r["base"] for r in exclusive_prefix_sums(
            df, "k", {"cnt": "base"}, descending=desc).collect()}
        want, run = {}, 0
        for k in sorted(agg, reverse=desc):
            want[k] = run
            run += agg[k]
        assert got == want


@given(st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 72), st.integers(-5, 5)),
    min_size=1, max_size=30,
))
@SETTINGS
def test_resample_locf_matches_python_model(spark, rows):
    """resample_locf == a per-key Python walk over the hourly grid with
    carry-forward, for arbitrary (key, hour-offset, value) events."""
    from datetime import datetime, timedelta

    from api_to_amt_data_lake_spark.operators.asof import resample_locf

    base = datetime(2024, 3, 1)
    ev = [(k, base + timedelta(hours=h, minutes=k % 60), float(v))
          for k, h, v in rows]
    df = spark.createDataFrame(ev, "k int, ts timestamp, v double")
    got = {(r["k"], str(r["slot"])): r["v"]
           for r in resample_locf(df, "k", "ts", "v").collect()}

    want = {}
    bykey: dict[int, list] = {}
    for k, ts, v in ev:
        bykey.setdefault(k, []).append((ts, v))
    for k, evs in bykey.items():
        slots = sorted({ts.replace(minute=0, second=0) for ts, _ in evs})
        lo, hi = slots[0], slots[-1]
        cur, s = None, lo
        while s <= hi:
            inslot = [(ts, v) for ts, v in evs
                      if ts.replace(minute=0, second=0) == s]
            if inslot:
                cur = max(inslot)[1]  # (ts, v) max == latest ts, v tiebreak
            want[(k, str(s))] = cur
            s += timedelta(hours=1)
    assert got == want


class TestGridQuantiles:
    """grid_sketch/grid_quantiles vs a pure-Python quantile model."""

    @SETTINGS
    @given(vals=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1, max_size=60))
    def test_estimate_is_true_quantile_rounded_up_to_bin_edge(
            self, spark, vals):
        import math

        from api_to_amt_data_lake_spark.operators.sketches import (
            grid_quantiles,
            grid_sketch,
        )

        width = 100
        df = spark.createDataFrame(
            [("g", int(v)) for v in vals], ["k", "v"])
        out = grid_quantiles(
            grid_sketch(df, ["k"], "v", width), ["k"], width).collect()[0]
        sv = sorted(vals)
        for pct in (50, 90, 99):
            exact = sv[math.ceil(pct / 100 * len(sv)) - 1]
            est = out[f"p{pct}_est"]
            assert est == (exact // width + 1) * width


class TestDomainCap:
    """domain_cap vs a pure-Python md5-order model."""

    @SETTINGS
    @given(rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=500),
                  st.sampled_from(["a", "b", "c"])),
        min_size=1, max_size=80, unique_by=lambda r: r[0]))
    def test_matches_python_md5_order(self, spark, rows):
        import hashlib

        from api_to_amt_data_lake_spark.operators.sampling import domain_cap

        cap = 4
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        got = {(r["doc_id"], r["domain_rank"])
               for r in domain_cap(df, "source", "doc_id", cap=cap,
                                   seed=11).collect()}
        want = set()
        for dom in {s for _, s in rows}:
            members = sorted(
                (i for i, s in rows if s == dom),
                key=lambda i: (
                    hashlib.md5(f"{i}:11".encode()).hexdigest(), i))
            want |= {(i, rk + 1) for rk, i in enumerate(members[:cap])}
        assert got == want


class TestRound9Sweeps:
    """Sort-sweep operators vs brute-force Python models, randomized."""

    @SETTINGS
    @given(st.lists(
        st.tuples(st.integers(0, 60), st.integers(1, 25)),
        min_size=1, max_size=60))
    def test_interval_coverage_equals_point_set(self, spark, spans):
        from api_to_amt_data_lake_spark.operators.intervals import (
            interval_coverage,
        )

        df = spark.createDataFrame(
            [("k", s, s + w) for s, w in spans], "k string, s long, e long")
        [r] = interval_coverage(df, ["k"], "s", "e").collect()
        pts = set()
        for s, w in spans:
            pts.update(range(s, s + w))
        assert r.covered == len(pts)
        # segment count == number of maximal runs in the point set
        runs = sum(1 for p in pts if p - 1 not in pts)
        assert r.n_segments == runs

    @SETTINGS
    @given(st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1, max_size=50))
    def test_frontier_equals_quadratic_model(self, spark, pts):
        from api_to_amt_data_lake_spark.operators.frontier import (
            pareto_frontier_2d,
        )

        df = spark.createDataFrame(
            [("g", float(x), y) for x, y in pts],
            "g string, x double, y int")
        fast = {(r.x, r.y) for r in
                pareto_frontier_2d(df, "x", "y", ["g"]).collect()}
        uniq = {(float(x), y) for x, y in pts}
        naive = {(x, y) for x, y in uniq
                 if not any(x2 <= x and y2 >= y and (x2 < x or y2 > y)
                            for x2, y2 in uniq)}
        assert fast == naive

    @SETTINGS
    @given(st.lists(st.floats(-5, 5, allow_nan=False), min_size=1,
                    max_size=80),
           st.floats(0, 2, allow_nan=False))
    def test_cusum_equals_recursion(self, spark, vals, k):
        from api_to_amt_data_lake_spark.operators.timeseries import (
            cusum_drift,
        )

        df = spark.createDataFrame(
            [("g", i, float(v)) for i, v in enumerate(vals)],
            "g string, i long, x double")
        rows = sorted(
            cusum_drift(df, ["g"], [F.col("i")], "x", k, 1e9).collect(),
            key=lambda r: r.i)
        s = 0.0
        for v, r in zip(vals, rows):
            s = max(0.0, s + v - k)
            assert abs(r.cusum - s) < 1e-6


def test_bigram_lm_perplexity_matches_python_model(spark):
    """Randomized parity: the distributed add-k bigram LM must score
    every document exactly like a dict-based reference implementation
    (same smoothing, same vocabulary definition)."""
    import math
    import random

    from pyspark.sql import functions as F

    from api_to_amt_data_lake_spark.operators.text import (
        bigram_lm_perplexity,
    )

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(12)]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 15))),
             rng.random() < 0.5)
            for i in range(60)]
    k = 0.5
    # Reference model.
    c12: dict = {}
    c1: dict = {}
    ref_words = set()
    for _i, text, is_ref in rows:
        ws = text.split(" ")
        if is_ref:
            ref_words.update(ws)
            for a, b in zip(ws, ws[1:]):
                c12[(a, b)] = c12.get((a, b), 0) + 1
                c1[a] = c1.get(a, 0) + 1
    v = float(len(ref_words))
    want = {}
    for i, text, _is_ref in rows:
        ws = text.split(" ")
        if len(ws) < 2:
            continue
        lps = [math.log((c12.get((a, b), 0) + k) / (c1.get(a, 0) + k * v))
               for a, b in zip(ws, ws[1:])]
        nll = -sum(lps) / len(lps)
        want[i] = (len(lps), round(nll, 6), round(math.exp(nll), 2))

    df = spark.createDataFrame(rows, ["doc_id", "text", "is_ref"])
    got = {r["doc_id"]: (r["n_bigrams"], r["nll"], r["ppl"])
           for r in bigram_lm_perplexity(
               df, "doc_id", "text", reference=F.col("is_ref"),
               k=k).collect()}
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert abs(got[i][1] - want[i][1]) < 2e-6, (i, got[i], want[i])
        assert abs(got[i][2] - want[i][2]) < 2e-2, (i, got[i], want[i])


def test_chi2_keyness_and_kl_drift_match_python(spark):
    """Randomized parity for the corpus-statistics queries' math: the
    distributed chi-squared keyness and smoothed KL-drift contributions
    must equal Counter-based reference implementations on a random
    corpus written through the same parquet shape the queries read."""
    import math
    import random
    from collections import Counter

    from api_to_amt_data_lake_spark.plans import conformance

    rng = random.Random(5)
    vocab = [f"t{i}" for i in range(15)]
    langs = ["en", "de", "fr"]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(2, 12))),
             rng.choice(langs), "s0", 0)
            for i in range(80)]
    import tempfile
    sf_dir = tempfile.mkdtemp(prefix="props_")
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(f"{sf_dir}/documents.parquet")

    # --- chi2 keyness reference ---
    lw: Counter = Counter()
    wl: Counter = Counter()
    ll: Counter = Counter()
    n_tot = 0
    for _i, text, lang, _s, _n in rows:
        for w in text.split(" "):
            lw[(lang, w)] += 1
            wl[w] += 1
            ll[lang] += 1
            n_tot += 1
    scored = []
    for (lang, w), a in lw.items():
        b = wl[w] - a
        c = ll[lang] - a
        d = n_tot - ll[lang] - b
        n = float(n_tot)
        a, b, c, d = map(float, (a, b, c, d))
        if not a > (a + b) * (a + c) / n:
            continue
        chi2 = round(n * (a * d - b * c) ** 2
                     / ((a + b) * (c + d) * (a + c) * (b + d)), 4)
        scored.append((lang, chi2, w))
    want = set()
    by_lang: dict = {}
    for lang, chi2, w in scored:
        by_lang.setdefault(lang, []).append((chi2, w))
    for lang, items in by_lang.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        for rk, (chi2, w) in enumerate(items[:3], start=1):
            want.add((lang, w, chi2, rk))
    got = {(r["lang"], r["word"], r["chi2"], r["rk"])
           for r in conformance.QUERIES["q99zze_chi2_keyness"](
               spark, sf_dir).collect()}
    assert got == want

    # --- KL drift reference ---
    c_new: Counter = Counter()
    c_old: Counter = Counter()
    for i, text, _lang, _s, _n in rows:
        tgt = c_new if i % 2 == 1 else c_old
        for w in text.split(" "):
            tgt[w] += 1
    joint = set(c_new) | set(c_old)
    v = float(len(joint))
    n_new, n_old = float(sum(c_new.values())), float(sum(c_old.values()))
    want_kl = {}
    for w in joint:
        p = (c_new[w] + 0.5) / (n_new + 0.5 * v)
        qq = (c_old[w] + 0.5) / (n_old + 0.5 * v)
        want_kl[w] = round(p * math.log(p / qq), 6)
    got_kl = {r["word"]: r["kl_term"]
              for r in conformance.QUERIES["q99zzf_vocab_kl_drift"](
                  spark, sf_dir).collect()}
    assert set(got_kl) == set(want_kl)
    for w in want_kl:
        assert abs(got_kl[w] - want_kl[w]) < 2e-6, w


def test_bigram_lm_perplexity_wide_vocab_shuffle_path(spark):
    """ADVICE r9 (medium): the vocab-sized context table c1 must NOT
    carry a forced broadcast hint — with broadcast joins disabled
    entirely (the stand-in for a web-scale |vocab| past driver limits)
    the c1 join must degrade to a shuffle equi-join on w1 and still
    score every document exactly like the dict-based reference model.
    A forced F.broadcast(c1) would bypass both thresholds and keep
    broadcasting (the OOM cliff this pins shut)."""
    import math
    import random

    from pyspark.sql import functions as F

    from api_to_amt_data_lake_spark.operators.text import (
        bigram_lm_perplexity,
    )

    rng = random.Random(23)
    # Wide vocabulary: most words unique -> c1 has ~one row per word.
    vocab = [f"tok{i}" for i in range(3000)]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(2, 20))),
             rng.random() < 0.6)
            for i in range(80)]
    k = 0.5
    c12: dict = {}
    c1: dict = {}
    ref_words = set()
    for _i, text, is_ref in rows:
        ws = text.split(" ")
        if is_ref:
            ref_words.update(ws)
            for a, b in zip(ws, ws[1:]):
                c12[(a, b)] = c12.get((a, b), 0) + 1
                c1[a] = c1.get(a, 0) + 1
    v = float(len(ref_words))
    want = {}
    for i, text, _is_ref in rows:
        ws = text.split(" ")
        lps = [math.log((c12.get((a, b), 0) + k) / (c1.get(a, 0) + k * v))
               for a, b in zip(ws, ws[1:])]
        nll = -sum(lps) / len(lps)
        want[i] = (len(lps), round(nll, 6))

    df = spark.createDataFrame(rows, ["doc_id", "text", "is_ref"])
    out = bigram_lm_perplexity(df, "doc_id", "text",
                               reference=F.col("is_ref"), k=k)
    conf = spark.conf
    saved = {key: conf.get(key, None) for key in
             ("spark.sql.autoBroadcastJoinThreshold",
              "spark.sql.adaptive.autoBroadcastJoinThreshold")}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # The w1 context join must be a shuffle join under these confs;
        # only the 1-row scalar V keeps its (hinted) broadcast.
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        got = {r["doc_id"]: (r["n_bigrams"], r["nll"])
               for r in out.collect()}
    finally:
        for key, val in saved.items():
            if val is None:
                conf.unset(key)
            else:
                conf.set(key, val)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert abs(got[i][1] - want[i][1]) < 2e-6, (i, got[i], want[i])
