"""ews collection views (reference `parquet/amt/ews/`)."""

from api_to_amt_data_lake_spark.amt.ews import (  # noqa: F401
    student_early_warning_fact,
    student_section_grade_fact,
)
