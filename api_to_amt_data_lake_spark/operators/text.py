"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, codegen'd; zero Python UDFs):
- token counting (whitespace tokenizer)
- quality scoring (length / punctuation / stopword ratios)
- language-ID (marker-token heuristic)
- document fingerprinting (order-insensitive content hash)

Scale: every op is embarrassingly parallel per-row — no shuffle at all;
at 100 TB these run at scan speed with full predicate/column pruning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(c: Column | str) -> Column:
    """Whitespace tokens of trimmed text."""
    return F.split(F.trim(_col(c)), " ")


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


# GPT-2-style pre-tokenizer pattern: contractions, space-prefixed letter
# runs, digit runs, other-symbol runs, residual whitespace. Deliberately
# restricted to constructs with identical semantics in Java regex (Spark)
# and RE2 (DuckDB/oracle): no lookahead, no unicode categories.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count(c: Column | str) -> Column:
    """Token count under a BPE-ish pre-tokenization (the piece count a
    GPT-2-family tokenizer would split further into subwords). A single
    JVM-side regexp_count — the scalable estimator for per-document token
    budgets; a real BPE vocab lookup would be an Arrow-batched Pandas UDF
    over these pieces."""
    return F.regexp_count(_col(c), F.lit(BPE_PATTERN)).cast("long")


def occurrence_count(c: Column | str, marker: str) -> Column:
    """How many times `marker` occurs — the replace-and-measure trick,
    deterministic and identical in any SQL dialect."""
    col = _col(c)
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("long")


# Marker tokens per language for the n-gram-ish language-ID heuristic.
# Real pipelines plug in fastText/cld3 via a Pandas UDF; the heuristic is
# the oracle-checkable deterministic baseline.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "value", "fast"),
    "es": ("data", "row", "slow"),
    "de": ("table", "scan", "merge"),
}


def lang_scores(c: Column | str) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), F.trim(_col(c)), F.lit(" "))
    return {
        lang: sum(
            (occurrence_count(padded, f" {m} ") for m in markers), F.lit(0).cast("long")
        )
        for lang, markers in LANG_MARKERS.items()
    }


def predicted_lang(c: Column | str) -> Column:
    """Argmax of marker scores with fixed tie order en > es > de."""
    s = lang_scores(c)
    return (
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["de"]), F.lit("en"))
        .when(s["es"] >= s["de"], F.lit("es"))
        .otherwise(F.lit("de"))
    )


def punct_count(c: Column | str) -> Column:
    col = _col(c)
    return (F.length(col) - F.length(F.regexp_replace(col, r"[.,;:!?]", ""))).cast("long")


def quality_score(c: Column | str) -> Column:
    """[0,1] heuristic: longer docs with moderate word length score higher.

    score = min(1, tokens/100) * (1 - punct_ratio); deterministic
    arithmetic only (single divisions — bit-exact across engines).
    """
    col = _col(c)
    n_tok = token_count(col).cast("double")
    n_chars = F.length(col).cast("double")
    punct_ratio = punct_count(col).cast("double") / F.greatest(n_chars, F.lit(1.0))
    return F.least(n_tok / F.lit(100.0), F.lit(1.0)) * (F.lit(1.0) - punct_ratio)


def content_fingerprint(c: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set. Two docs with the same bag-of-words (ignoring order and
    multiplicity) collide — the cheap first pass before MinHash."""
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens(c))), " ")
    )


# Regexes restricted to syntax shared by Java regex (Spark) and RE2
# (DuckDB) so the oracle runs the LITERAL same patterns: no backrefs, no
# lookaround.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"
IPV4_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"


def scrub_pii(c: Column | str) -> Column:
    """Replace emails / phone-number runs / IPv4 literals with typed
    placeholder tokens — the standard pre-training redaction pass.

    Order matters: emails first (their local part would otherwise be
    chewed up by the phone pattern's digit runs), then phones, then IPs.
    Pure `regexp_replace` chain — codegen-friendly, shuffle-free, and
    dialect-portable (patterns avoid Java/RE2 differences).
    """
    col = _col(c)
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, IPV4_RE, "<IP>")


def pii_counts(c: Column | str) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) found in the raw text — the audit
    metric a scrub pass reports alongside the redacted corpus."""
    col = _col(c)
    return (F.regexp_count(col, F.lit(EMAIL_RE)),
            F.regexp_count(col, F.lit(PHONE_RE)),
            F.regexp_count(col, F.lit(IPV4_RE)))
