"""View-plan layer: output contracts + the view registry/runner."""

from api_to_amt_data_lake_spark.plans.contracts import ViewContract

__all__ = ["ViewContract"]
