"""rls_user_dim — staff work emails.

Parity target: `parquet/amt/rls/rls_user_dim/main.py`. staffs exploded on
`electronicMails` (`main.py:49-62`), inner-joined back to the staff list
(`main.py:64-77` — the explode already carries `staffUniqueId`, so this is
a no-op join in Spark), then filtered to the `Email.Work` crosswalk
constant (`main.py:80-81`).

Scale: one scan + one broadcast crosswalk join; no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    array_col,
    read_collection,
)
from api_to_amt_data_lake_spark.sources.lookup import with_descriptor_constant

CONTRACT = ViewContract(
    name="rls_UserDim",
    columns=("UserKey", "UserEmail"),
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    staffs = read_collection(spark, silver_root, school_year, "staffs")
    if staffs is None:
        return CONTRACT.empty(spark)

    mails = staffs.select(
        F.col("staffUniqueId").cast("string").alias("UserKey"),
        F.explode(array_col(
            staffs, "electronicMails",
            "struct<electronicMailAddress:string,"
            "electronicMailTypeDescriptor:string>")).alias("_m"),
    ).select(
        "UserKey",
        F.col("_m.electronicMailAddress").alias("UserEmail"),
        F.col("_m.electronicMailTypeDescriptor")
        .alias("electronicMailTypeDescriptor"),
    )
    work = with_descriptor_constant(mails, "electronicMailTypeDescriptor") \
        .filter(F.col("electronicMailTypeDescriptor_constantName")
                .contains("Email.Work"))
    return CONTRACT.conform(work.select("UserKey", "UserEmail"), spark)
