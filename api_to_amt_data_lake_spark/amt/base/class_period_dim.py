"""class_period_dim — section class periods with composite keys.

Parity target: `parquet/amt/base/class_period_dim/main.py` (RESULT_COLUMNS
`main.py:23-33`; key concats `main.py:93-110`). Single source (sections),
recordPath explode on classPeriods left-joined back to section meta —
in Spark that's one `explode_outer` (the reference's left merge keeps
sections with no classPeriods, with the name column null-propagating
into ClassPeriodKey via pandas `+`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.keys import sk_concat_strict
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import read_collection

CONTRACT = ViewContract(
    name="classPeriodDim",
    columns=(
        "ClassPeriodKey", "SectionKey", "ClassPeriodName", "LocalCourseCode",
        "SchoolId", "SchoolKey", "SchoolYear", "SectionIdentifier", "SessionName",
    ),
    types={"SchoolId": "long"},
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    sections = read_collection(spark, silver_root, school_year, "sections")
    if sections is None:
        return CONTRACT.empty(spark)

    has_cp = "classPeriods" in sections.columns
    cp_name = (
        F.col("cp.classPeriodReference.classPeriodName") if has_cp
        else F.lit(None).cast("string")
    )
    base = sections.select(
        F.col("sectionIdentifier").alias("SectionIdentifier"),
        F.col("courseOfferingReference.localCourseCode").alias("LocalCourseCode"),
        F.col("courseOfferingReference.schoolId").cast("long").alias("SchoolId"),
        F.col("courseOfferingReference.schoolYear").cast("string").alias("SchoolYear"),
        F.col("courseOfferingReference.sessionName").alias("SessionName"),
        *( [F.explode_outer("classPeriods").alias("cp")] if has_cp else [] ),
    ).select(
        "SectionIdentifier", "LocalCourseCode", "SchoolId", "SchoolYear",
        "SessionName", cp_name.alias("ClassPeriodName"),
    )

    return CONTRACT.conform(
        base.select(
            sk_concat_strict(
                "ClassPeriodName", "LocalCourseCode", "SchoolId", "SchoolYear",
                "SectionIdentifier", "SessionName",
            ).alias("ClassPeriodKey"),
            sk_concat_strict(
                "SchoolId", "LocalCourseCode", "SchoolYear",
                "SectionIdentifier", "SessionName",
            ).alias("SectionKey"),
            "ClassPeriodName", "LocalCourseCode", "SchoolId",
            F.col("SchoolId").cast("string").alias("SchoolKey"),
            "SchoolYear", "SectionIdentifier", "SessionName",
        ),
        spark,
    )
