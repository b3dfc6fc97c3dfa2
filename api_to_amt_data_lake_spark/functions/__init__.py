"""Expression library: reusable Column-level functions (SURVEY.md §2.7).

These are plain Python functions over ``pyspark.sql.Column`` — no UDFs, no
Catalyst extensions — so every use stays inside whole-stage codegen.
"""

from api_to_amt_data_lake_spark.functions.descriptors import (
    descriptor_code_value,
    descriptor_name,
    ref_from_href,
)
from api_to_amt_data_lake_spark.functions.dates import (
    date_key,
    month_name,
    quarter_name,
    to_date_safe,
)
from api_to_amt_data_lake_spark.functions.keys import sk_concat, sk_concat_strict
from api_to_amt_data_lake_spark.functions.nulls import (
    add_column_if_not_exists,
    empty_to_null,
    null_to_empty,
    replace_null,
)

__all__ = [
    "descriptor_code_value",
    "descriptor_name",
    "ref_from_href",
    "date_key",
    "month_name",
    "quarter_name",
    "to_date_safe",
    "sk_concat",
    "sk_concat_strict",
    "add_column_if_not_exists",
    "empty_to_null",
    "null_to_empty",
    "replace_null",
]
