"""chrab collection views (reference `parquet/amt/chrab/`)."""

from api_to_amt_data_lake_spark.amt.chrab import (  # noqa: F401
    chronic_absenteeism_attendance_fact,
)
