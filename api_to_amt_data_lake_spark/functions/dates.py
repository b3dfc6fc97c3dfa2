"""Date expressions (SURVEY.md §2.7 F7-F10, F17).

The reference's universal comparison format is the 8-char ``yyyymmdd``
string date-key (`parquet/Common/pandasWrapper.py:143-144`) — lexicographic
order == chronological order, which lets every range predicate run as a
plain string comparison that Catalyst pushes into scans and joins.

``run_date`` injection: every reference call to ``date.today()``
(e.g. `ews/student_early_warning_fact/main.py:162-163`) takes an explicit
date parameter here so tests are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def date_key(c: Column | str) -> Column:
    """ISO date / date / timestamp -> 'yyyymmdd' string key.

    Reference `to_datetime_key` (`pandasWrapper.py:143-144`):
    ``str(value).replace('-', '')[:8]``. Implemented without to_date so that
    already-keyed strings pass through unchanged, matching the reference.
    """
    return F.substring(F.regexp_replace(_col(c).cast("string"), "-", ""), 1, 8)


def to_date_safe(c: Column | str, fmt: str | None = None) -> Column:
    """Parse to DateType, null on failure (reference ``errors='ignore'``)."""
    return F.try_to_timestamp(_col(c).cast("string"),
                              F.lit(fmt) if fmt else F.lit("yyyy-MM-dd")).cast("date")


def month_name(c: Column | str) -> Column:
    """Full month name, e.g. 'January' (`base/date_dim/main.py:75`)."""
    return F.date_format(_col(c).cast("date"), "MMMM")


_QUARTER_NAMES = {1: "First", 2: "Second", 3: "Third", 4: "Fourth"}


def quarter_name(c: Column | str) -> Column:
    """Calendar quarter name (`base/date_dim/main.py:78-79` dict map F17)."""
    q = F.quarter(_col(c).cast("date"))
    expr = F.lit(None).cast("string")
    for num, name in _QUARTER_NAMES.items():
        expr = F.when(q == num, F.lit(name)).otherwise(expr)
    return expr


def run_date_key(run_date: str) -> Column:
    """The injected 'today' as a yyyymmdd literal key (replaces F10)."""
    return F.lit(run_date.replace("-", "")[:8])


def date_key_between(c: Column | str, lo: str, hi: str) -> Column:
    """Sargable form of ``date_key(c) BETWEEN lo AND hi`` (lo/hi are
    yyyymmdd keys) for date/timestamp columns.

    Because lexicographic order on date keys equals chronological order,
    the string-key range is equivalent to a native range on the underlying
    column — which Catalyst folds to literals and pushes into the parquet
    scan, where the formatted-string predicate cannot be pushed. Use this
    at filter sites; keep `date_key` for join keys and output columns.
    """
    start = F.to_timestamp(F.lit(lo), "yyyyMMdd")
    end_exclusive = F.date_add(F.to_date(F.lit(hi), "yyyyMMdd"), 1) \
        .cast("timestamp")
    col = _col(c)
    return (col >= start) & (col < end_exclusive)
