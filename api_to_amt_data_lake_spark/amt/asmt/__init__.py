"""asmt collection views (reference `parquet/amt/asmt/`)."""

from api_to_amt_data_lake_spark.amt.asmt import (  # noqa: F401
    assessment_fact,
    student_assessment_fact,
)
