"""equity collection views (reference `parquet/amt/equity/`)."""

from api_to_amt_data_lake_spark.amt.equity import feeder_school_dim  # noqa: F401
