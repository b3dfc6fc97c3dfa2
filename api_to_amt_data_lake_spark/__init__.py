"""PySpark-native analytics engine with the query/data-processing
capabilities of Ed-Fi-Exchange-OSS/API-to-AMT-Data-Lake.

Greenfield Spark-first design (SURVEY.md §7): a small expression/operator
library over the stock DataFrame API + declarative view builders + a
driver-side ingestion module. Zero row-at-a-time Python UDFs in the hot
path — every reference operator (SURVEY.md §2) maps to Catalyst-optimizable
built-ins; Pandas UDFs appear only where semantics genuinely require Python
(multimodal decode stubs).
"""

from api_to_amt_data_lake_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
