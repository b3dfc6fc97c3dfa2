"""base collection views (reference `parquet/amt/base/`)."""

from api_to_amt_data_lake_spark.amt.base import (  # noqa: F401
    academic_time_period_dim,
    all_student_school_dim,
    class_period_dim,
    contact_person_dim,
    date_dim,
    demographics_dim,
    grading_period_dim,
    local_education_agency_dim,
    school_dim,
    section_dim,
    staff_section_dim,
    student_local_education_agency_demographics_bridge,
    student_local_education_agency_dim,
    student_program_dim,
    student_school_demographics_bridge,
    student_school_dim,
    student_section_dim,
)
