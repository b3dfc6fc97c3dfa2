"""Null/empty-string dialect helpers (SURVEY.md §1.3, §2.7 F11).

The reference constantly collapses NaN→'' (``fillna('')``,
`replace_null` `pandasWrapper.py:151-154`, `replace_null_empty` `:157-162`,
`addColumnIfNotExists` `:138-140`). These helpers reproduce each variant
explicitly so every view chooses deliberately.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def replace_null(c: Column | str, value) -> Column:
    """`replace_null` (`pandasWrapper.py:151-154`): null -> value."""
    return F.coalesce(_col(c), F.lit(value))


def empty_to_null(c: Column | str) -> Column:
    """'' -> null (inverse half of `replace_null_empty` `:157-162`)."""
    col = _col(c)
    return F.when(col == "", F.lit(None)).otherwise(col)


def null_to_empty(c: Column | str) -> Column:
    """null -> '' — the reference's favorite pre-concat normalization."""
    return F.coalesce(_col(c).cast("string"), F.lit(""))


def replace_null_empty(c: Column | str, value) -> Column:
    """null OR '' -> value (`replace_null_empty` `pandasWrapper.py:157-162`)."""
    col = _col(c)
    return F.when(col.isNull() | (col == ""), F.lit(value)).otherwise(col)


def add_column_if_not_exists(df: DataFrame, name: str, default: str = "") -> DataFrame:
    """`addColumnIfNotExists` (`pandasWrapper.py:138-140`): guarantee a
    column exists, defaulting to '' — resilience to sparsely-populated
    JSON where an optional field is absent from every document."""
    if name in df.columns:
        return df
    return df.withColumn(name, F.lit(default))
