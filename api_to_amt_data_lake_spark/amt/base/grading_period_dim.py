"""grading_period_dim — grading periods joined to their descriptor ids.

Parity target: `parquet/amt/base/grading_period_dim/main.py` (RESULT_COLUMNS
`main.py:25-34`; key build `main.py:121-133`). Two sources, one inner
equi-join (J1) on descriptor code value — descriptor side broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.descriptors import descriptor_code_value
from api_to_amt_data_lake_spark.functions.keys import sk_concat_strict
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import read_collection

CONTRACT = ViewContract(
    name="gradingPeriodDim",
    columns=(
        "GradingPeriodKey", "GradingPeriodBeginDateKey", "GradingPeriodEndDateKey",
        "GradingPeriodDescription", "TotalInstructionalDays", "PeriodSequence",
        "SchoolKey", "SchoolYear",
    ),
    types={"TotalInstructionalDays": "long", "PeriodSequence": "long"},
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    gp = read_collection(spark, silver_root, school_year, "gradingPeriods")
    gpd = read_collection(spark, silver_root, school_year, "gradingPeriodDescriptors")
    if gp is None or gpd is None:
        return CONTRACT.empty(spark)

    periods = gp.select(
        F.col("schoolReference.schoolId").cast("string").alias("SchoolKey"),
        F.col("beginDate").cast("string").alias("beginDate"),
        F.col("endDate").cast("string").alias("endDate"),
        descriptor_code_value("gradingPeriodDescriptor").alias("codeValue"),
        F.col("totalInstructionalDays").cast("long").alias("TotalInstructionalDays"),
        F.col("periodSequence").cast("long").alias("PeriodSequence"),
        F.col("schoolYearTypeReference.schoolYear").cast("string").alias("SchoolYear"),
    )
    descriptors = gpd.select(
        F.col("gradingPeriodDescriptorId").cast("string")
        .alias("gradingPeriodDescriptorId"),
        F.col("codeValue").alias("codeValue"),
    )
    joined = periods.join(F.broadcast(descriptors), "codeValue", "inner")
    begin_key = date_key("beginDate")
    return CONTRACT.conform(
        joined.select(
            sk_concat_strict(
                "gradingPeriodDescriptorId", "SchoolKey", begin_key
            ).alias("GradingPeriodKey"),
            begin_key.alias("GradingPeriodBeginDateKey"),
            date_key("endDate").alias("GradingPeriodEndDateKey"),
            F.col("codeValue").alias("GradingPeriodDescription"),
            "TotalInstructionalDays", "PeriodSequence", "SchoolKey", "SchoolYear",
        ),
        spark,
    )
