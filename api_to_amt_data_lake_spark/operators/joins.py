"""Join idioms (SURVEY.md §2.3).

The reference's only non-equi shape is interval containment done as
equi-join-then-filter (J7, `ews/student_early_warning_fact/main.py:148-166`).
Expressed here as a single join with the range predicate *in the join
condition* so Catalyst evaluates it during the join instead of exploding
the full equi-match first — the reference's biggest inefficiency fixed for
free (SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: Sequence[tuple[str, str]],
    point: str,
    start: str,
    end: str,
    how: str = "inner",
    end_open_means_current: bool = False,
) -> DataFrame:
    """Join rows of `left` (events carrying a point column, e.g. a date key)
    to rows of `right` (spans with start/end columns) where the equi keys
    match and start <= point <= end.

    ``end_open_means_current=True`` reproduces the reference's null/empty
    exit-date semantics (`chrab/...:142-145`): a span with '' or null end
    is open-ended.

    Scale: the equi keys drive the shuffle partitioning; the range predicate
    is evaluated inside the (sort-merge or broadcast) join. At 100 TB the
    cardinality of the equi key (schoolId in the reference) bounds skew —
    AQE skew-join splitting handles hot schools.
    """
    cond: Column | None = None
    for lk, rk in equi_keys:
        c = left[lk] == right[rk]
        cond = c if cond is None else (cond & c)
    end_c = right[end]
    range_c = left[point] >= right[start]
    if end_open_means_current:
        range_c = range_c & (end_c.isNull() | (end_c == "") | (left[point] <= end_c))
    else:
        range_c = range_c & (left[point] <= end_c)
    cond = range_c if cond is None else (cond & range_c)
    return left.join(right, cond, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot `left` key over `n_salt`
    shuffle partitions and replicate the matching `right` rows once per
    salt value.

    When one join key holds a disproportionate share of the big side's
    rows (one school with half the enrollments, one user with half the
    events), a plain shuffle join lands that entire key on a single task.
    Salting re-keys left rows with ``(key, hash(row) % n_salt)`` —
    deterministic, derived from the row's own columns — and explodes the
    right side across all salt values, so the hot key's probe work is
    split across `n_salt` tasks at the cost of an `n_salt`-times larger
    build side for matched keys. Results are identical to the plain join
    (conformance q45 checks this against an unsalted SQL oracle).

    Prefer AQE's automatic skew-join splitting when the skewed side is
    the probe of a sort-merge join; use this when the skew survives AQE
    (e.g. broadcast-hash plans or aggregation-feeding joins).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    l2 = left.withColumn("_salt", salt)
    r2 = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>"))
    )
    cond = (l2[left_key] == r2[right_key]) & (l2["_salt"] == r2["_salt"])
    return l2.join(r2, cond, how).drop("_salt")


def bloom_semi_join(
    large: DataFrame,
    small: DataFrame,
    large_key: str,
    small_key: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
    exact: bool = True,
) -> DataFrame:
    """Semi join with a Bloom-filter pre-pass: build a bitmap over the
    small side's keys, prune the large side against it with broadcast
    joins, then (by default) run the exact semi join on the survivors.
    Output rows are exactly `large LEFT SEMI JOIN small` — the Bloom
    pass changes WHERE the work happens, never the result.

    Why this matters at 100 TB: a plain shuffle semi join exchanges the
    ENTIRE large side on the key. The Bloom bitmap is `n_bits/8` bytes
    (128 KiB at the default 2^20 bits) regardless of how many keys the
    small side holds — broadcastable even when the small side's key SET
    is too big to broadcast as a hash relation — and each probe pass is
    a broadcast hash join, so the large side is pruned to ~the matching
    rows (plus the false-positive rate, (1-e^{-kn/m})^k) BEFORE the one
    remaining shuffle. This is the same runtime row-level filtering
    Spark's own InjectRuntimeFilter applies to selective joins,
    expressed as an explicit operator so it composes (e.g. ahead of an
    aggregation or a non-equi refinement).

    Mechanics: hash i of a key is `xxhash64(key, lit(i)) mod n_bits`;
    the bitmap is (word = bit div 64, mask = BIT_OR of 1<<(bit mod 64))
    rows — at most n_bits/64 rows, built with one map-side-combined
    aggregation over the small side. Probing chains `n_hashes`
    broadcast joins, each keeping rows whose hash-i bit is set; a key
    survives only if ALL bits are set. `exact=False` returns the
    pruned-but-unverified frame (useful when a downstream exact join
    re-checks the key anyway).
    """
    def _word(pos: Column) -> Column:
        return (pos / 64).cast("long")

    def _bit(pos: Column) -> Column:
        # shiftleft with a COLUMN shift amount needs the SQL form —
        # pyspark's F.shiftleft only accepts a Python-int numBits.
        return F.expr("shiftleft(CAST(1 AS BIGINT), "
                      "CAST(pmod(_pos, 64) AS INT))")

    sk = F.col(small_key)
    words = None
    for i in range(n_hashes):
        pos = F.pmod(F.xxhash64(sk, F.lit(i)), F.lit(n_bits))
        w = small.select(pos.alias("_pos")).select(
            _word(F.col("_pos")).alias("_word"),
            _bit(F.col("_pos")).alias("_bit"),
        )
        words = w if words is None else words.unionAll(w)
    bitmap = words.groupBy("_word").agg(F.bit_or("_bit").alias("_mask"))

    pruned = large
    lk = F.col(large_key)
    for i in range(n_hashes):
        pos = F.pmod(F.xxhash64(lk, F.lit(i)), F.lit(n_bits))
        probe = pruned.withColumn("_pos", pos).withColumn(
            "_pw", _word(F.col("_pos"))
        ).withColumn("_pb", _bit(F.col("_pos"))).drop("_pos")
        # All n_hashes passes broadcast the IDENTICAL bitmap subplan —
        # no per-pass renames — so Spark's ReuseExchange rule builds
        # the bitmap aggregation once and the remaining passes hit
        # ReusedExchange instead of recomputing it.
        bm = F.broadcast(bitmap)
        pruned = (
            probe.join(bm, probe["_pw"] == bm["_word"], "left")
            .filter(F.col("_mask").isNotNull()
                    & (F.col("_mask").bitwiseAND(F.col("_pb")) != 0))
            .drop("_pw", "_pb", "_word", "_mask")
        )
    if not exact:
        return pruned
    return pruned.join(small.select(sk.alias(small_key)).distinct(),
                       lk == F.col(small_key), "left_semi")


def range_bin_join(
    points: DataFrame,
    spans: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: float,
    how: str = "inner",
    end_inclusive: bool = False,
) -> DataFrame:
    """Point-in-range join WITHOUT an equi key, made shuffle-joinable by
    bin blocking: every span explodes to the fixed-width bins it covers,
    every point keys to its one bin, and the join runs as a plain
    equi-join on the bin id with the range predicate as a refinement.
    Lossless by construction — a point inside a span shares at least
    one bin with it.

    Why this exists: Spark has no native range-join optimization — a
    bare `points JOIN spans ON p BETWEEN lo AND hi` falls back to
    BroadcastNestedLoopJoin (O(|points|·|spans|) compares, and a crash
    when neither side broadcasts). Binning turns it into one shuffle on
    a high-cardinality integer key, the same trick Databricks' range
    join hint applies internally. Work per span is
    O(span_width/bin_width) candidate bins; pick `bin_width` near the
    TYPICAL span width so each span explodes to ~2 bins and each bin
    holds few spans. Skewed bins (one bin covering many spans) behave
    like any hot equi key — AQE skew split or `salted_join` apply.

    `end_inclusive` chooses [start, end] vs [start, end). Columns must
    be numeric (cast timestamps to epoch seconds/micros first).
    """
    w = float(bin_width)
    span_bins = spans.withColumn(
        "_bin",
        F.explode(F.sequence(
            F.floor(F.col(start_col) / w).cast("long"),
            F.floor(F.col(end_col) / w).cast("long"))))
    point_bins = points.withColumn(
        "_bin", F.floor(F.col(point_col) / w).cast("long"))
    refine = F.col(point_col) >= F.col(start_col)
    refine = refine & (
        (F.col(point_col) <= F.col(end_col)) if end_inclusive
        else (F.col(point_col) < F.col(end_col)))
    return point_bins.join(span_bins, ["_bin"], how) \
        .filter(refine).drop("_bin")
