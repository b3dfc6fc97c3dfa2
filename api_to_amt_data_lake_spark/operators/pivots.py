"""Pivot idioms (SURVEY.md §2.4 A9/A10, §2.3 J8).

Scale note: `groupBy().pivot(col, values)` with an *explicit* value list is
a single shuffle + map-side partial aggregation; omitting the list forces an
extra distinct-collect job, so every call here requires the category list
(which the reference also hard-codes — its views rename/default-fill fixed
category columns, e.g. `ews/student_early_warning_fact/main.py:202-207`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def crosstab_count(
    df: DataFrame,
    keys: Sequence[str],
    category_col: str,
    categories: Sequence[str],
    fill: int = 0,
    rename: dict[str, str] | None = None,
) -> DataFrame:
    """`pd.crosstab` parity (A9, `pandasWrapper.py:110-111`): count of rows
    per key-tuple × category, wide 0-filled columns, stable schema even for
    absent categories.
    """
    out = (
        df.groupBy(*keys)
        .pivot(category_col, list(categories))
        .agg(F.count(F.lit(1)))
    )
    # Backtick-escape category columns: values like 'AttendanceEvent.Present'
    # would otherwise resolve as nested field paths.
    sel = [F.col(f"`{k}`") for k in keys]
    for c in categories:
        target = (rename or {}).get(c, c)
        sel.append(F.coalesce(F.col(f"`{c}`"), F.lit(fill)).alias(target))
    return out.select(*sel)


def pivot_first(
    df: DataFrame,
    keys: Sequence[str],
    category_col: str,
    categories: Sequence[str],
    value_col: str,
    rename: dict[str, str] | None = None,
) -> DataFrame:
    """Long→wide first-value pivot (A10,
    `base/student_local_education_agency_dim/main.py:266-272`) — also the
    preferred replacement for the reference's filtered-fanout k-way join
    pattern (J8, `base/contact_person_dim/main.py:186-278`): instead of
    joining the same child table k times (k shuffles), pivot once
    (1 shuffle) and join once.

    ``first`` here is the deterministic min-by-value first, not arrival
    order: the reference's fanout joins pick the single matching row per
    (key, category); when duplicates exist pandas keeps all (fanout), and
    views de-dup upstream — so min() is a safe, deterministic tiebreak.
    """
    out = (
        df.groupBy(*keys)
        .pivot(category_col, list(categories))
        .agg(F.min(value_col))
    )
    sel = [F.col(f"`{k}`") for k in keys]
    for c in categories:
        target = (rename or {}).get(c, c)
        sel.append(F.col(f"`{c}`").alias(target))
    return out.select(*sel)
