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
