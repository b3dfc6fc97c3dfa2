"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship pricing-summary aggregation at sf0.001;
`queries()` / `oracle_sql()` expose the operator conformance suite
(api_to_amt_data_lake_spark.plans.conformance) — one named query per
implemented operator from SURVEY.md §2 plus the training-data-pipeline
suite (dedup / similarity / text / multimodal), each with a DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from api_to_amt_data_lake_spark.plans import conformance  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return conformance.q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(conformance.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (same column names/types)."""
    return dict(conformance.ORACLE)
