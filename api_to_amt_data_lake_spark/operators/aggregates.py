"""Aggregation idioms (SURVEY.md §2.4).

The only non-trivial one is the ordered string-agg (A7): the reference
sorts then ``'\\n '.join``s per group
(`equity/student_history_dim/main.py:295-311`). ``collect_list`` order is
nondeterministic under shuffles, so we sort *inside* the array:
collect structs → ``sort_array`` → project the payload → ``concat_ws``.
All JVM-side, one shuffle, deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def string_agg_ordered(
    df: DataFrame,
    keys: Sequence[str],
    value: Column | str,
    order_by: Sequence[Column | str],
    sep: str = "\n ",
    descending: bool = False,
    out_name: str = "agg",
) -> DataFrame:
    """Deterministic per-group ordered string concatenation.

    order_by columns are packed ahead of the value in a struct;
    ``sort_array`` orders lexicographically by struct fields in sequence,
    reproducing the reference's sort-then-join. ``descending=True`` flips
    the whole sort (reference sorts desc at
    `equity/student_history_dim/main.py:101-110`).
    """
    value_c = F.col(value) if isinstance(value, str) else value
    order_cs = [F.col(c) if isinstance(c, str) else c for c in order_by]
    fields = [c.alias(f"_o{i}") for i, c in enumerate(order_cs)]
    fields.append(value_c.alias("_v"))
    arr = F.sort_array(F.collect_list(F.struct(*fields)), asc=not descending)
    joined = F.array_join(F.transform(arr, lambda s: s["_v"]), sep)
    return df.groupBy(*keys).agg(joined.alias(out_name))
