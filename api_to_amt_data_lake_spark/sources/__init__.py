"""Sources & sinks (SURVEY.md §2.1)."""

from api_to_amt_data_lake_spark.sources.json_source import read_collection
from api_to_amt_data_lake_spark.sources.parquet_io import read_table, write_view
from api_to_amt_data_lake_spark.sources.lookup import (
    descriptor_constant_df,
    letter_grade_lookup_df,
)

__all__ = [
    "read_collection",
    "read_table",
    "write_view",
    "descriptor_constant_df",
    "letter_grade_lookup_df",
]
