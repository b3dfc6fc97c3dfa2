"""Reusable relational operators (SURVEY.md §2.3-§2.6) plus the
training-data-pipeline operator suite (dedup / similarity / text /
multimodal) that the 100 TB use-case needs.
"""

from api_to_amt_data_lake_spark.operators.aggregates import string_agg_ordered
from api_to_amt_data_lake_spark.operators.asof import asof_join
from api_to_amt_data_lake_spark.operators.joins import (
    bloom_semi_join,
    interval_join,
    range_bin_join,
    salted_join,
)
from api_to_amt_data_lake_spark.operators.pivots import crosstab_count, pivot_first
from api_to_amt_data_lake_spark.operators.sampling import stratified_sample

__all__ = [
    "string_agg_ordered",
    "asof_join",
    "crosstab_count",
    "pivot_first",
    "interval_join",
    "salted_join",
    "bloom_semi_join",
    "range_bin_join",
    "stratified_sample",
]
