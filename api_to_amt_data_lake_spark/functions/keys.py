"""Surrogate-key concatenation (SURVEY.md §2.7 F5).

The reference builds composite keys two ways and the null semantics differ
(SURVEY.md §7 risk 3):

- pandas ``a + '-' + b`` propagates NaN → the whole key is null. Use
  :func:`sk_concat_strict` where parity with that behavior matters.
- After ``fillna('')`` the same expression yields `'a--c'` style keys. Use
  :func:`sk_concat` (null treated as '') — the dominant reference pattern,
  e.g. `ews/student_section_grade_fact/main.py:199-223` (keys built after
  wholesale fillna).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _cols(cols) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def sk_concat(*cols: Column | str, sep: str = "-") -> Column:
    """Null-as-empty composite key: `concat_ws` keeps all positions.

    ``concat_ws`` skips nulls entirely (losing the separator), which would
    break positional parity — so coalesce each part to '' first.
    """
    parts = [F.coalesce(c.cast("string"), F.lit("")) for c in _cols(cols)]
    return F.concat_ws(sep, *parts)


def sk_concat_strict(*cols: Column | str, sep: str = "-") -> Column:
    """Null-propagating composite key (pandas `+` semantics): any null part
    nulls the whole key."""
    parts: list[Column] = []
    for i, c in enumerate(_cols(cols)):
        if i:
            parts.append(F.lit(sep))
        parts.append(c.cast("string"))
    return F.concat(*parts)
