"""feeder_school_dim — active feeder-school associations named via schools.

Parity target: `parquet/amt/equity/feeder_school_dim/main.py` (active-span
filter `main.py:59-63` — endDate >= today as yyyymmdd keys, F10 run_date
injection; self-flavored school join J6 `main.py:98-106`; unique key
concat `main.py:118-121`).
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.keys import sk_concat_strict
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import read_collection

CONTRACT = ViewContract(
    name="feederSchoolDim",
    columns=("feederSchoolUniqueKey", "schoolKey", "feederSchoolKey",
             "feederSchoolName"),
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    assoc = read_collection(spark, silver_root, school_year,
                            "feederSchoolAssociations")
    schools = read_collection(spark, silver_root, school_year, "schools")
    if assoc is None or schools is None:
        return CONTRACT.empty(spark)

    today_key = (run_date or date.today().isoformat()).replace("-", "")[:8]
    feeders = assoc.select(
        F.col("feederSchoolReference.schoolId").cast("string")
        .alias("feederSchoolKey"),
        F.col("schoolReference.schoolId").cast("string").alias("schoolKey"),
        *( [date_key("endDate").alias("_end")] if "endDate" in assoc.columns
           else [] ),
    )
    if "_end" in feeders.columns:
        feeders = feeders.filter(F.col("_end") >= today_key).drop("_end")

    names = schools.select(
        F.col("schoolId").cast("string").alias("_sid"),
        F.col("nameOfInstitution").alias("feederSchoolName"),
    )
    joined = feeders.join(
        F.broadcast(names), feeders.feederSchoolKey == names._sid, "inner"
    )
    return CONTRACT.conform(
        joined.select(
            sk_concat_strict("schoolKey", "feederSchoolKey")
            .alias("feederSchoolUniqueKey"),
            "schoolKey", "feederSchoolKey", "feederSchoolName",
        ),
        spark,
    )
