"""equity collection views (reference `parquet/amt/equity/`)."""

from api_to_amt_data_lake_spark.amt.equity import (  # noqa: F401
    feeder_school_dim,
    student_discipline_action_dim,
    student_history_dim,
    student_program_cohort_dim,
    student_school_food_service_program_dim,
)
