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
