"""End-to-end pipeline orchestrator (reference EP1 → EP2 composed).

The reference runs a Dagster job per school year: page every ODS
endpoint to silver JSON, then build the 41 AMT views to gold parquet
(`dagster_config/jobs/job.py`, `parquet/amt_parquet.py:20-41`). This is
that job as a plain function — host scheduling (cron, Airflow, Dagster)
stays out of the engine by design (SURVEY.md §7).

Incremental mode: when `min_change_version` tracking is wanted, land
with change-version params and fold increments via
`sources.incremental.refresh_snapshot` instead of full re-extract; this
orchestrator covers the reference's actual default (full re-extract
each run, `README.md:41,68`).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from api_to_amt_data_lake_spark.amt import registry
from api_to_amt_data_lake_spark.sources.rest import OdsConfig, land_all


def run_full_pipeline(
    spark: SparkSession,
    silver_root: str,
    gold_root: str,
    school_years: list[str | int],
    cfg: OdsConfig | None = None,
    endpoints: list[str] | None = None,
    with_deletes: bool = True,
    parallelism: int | None = 8,
    run_date: str | None = None,
    session=None,
) -> dict[str, dict[str, str]]:
    """Extract (optional) + build: returns {school_year: {view: path}}.

    With `cfg` set, every endpoint is paged to silver first (EP1, REST
    client with version gate/retries); with cfg=None the silver layer is
    assumed landed (the common test/replay path). Gold builds run with
    the parallel writer by default — shared upstreams cached once.
    """
    out: dict[str, dict[str, str]] = {}
    for year in school_years:
        if cfg is not None:
            land_all(cfg, endpoints or [], silver_root, year,
                     with_deletes=with_deletes, session=session)
        out[str(year)] = registry.run_all(
            spark, silver_root, gold_root, year,
            run_date=run_date, parallelism=parallelism)
    return out
