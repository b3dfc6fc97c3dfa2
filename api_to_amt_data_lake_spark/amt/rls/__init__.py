"""rls collection views (reference `parquet/amt/rls/`)."""

from api_to_amt_data_lake_spark.amt.rls import (  # noqa: F401
    rls_staff_classification_descriptor_scope_list,
    rls_student_data_authorization,
    rls_user_authorization,
    rls_user_dim,
    rls_user_student_data_authorization,
)
