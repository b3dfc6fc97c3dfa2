"""academic_time_period_dim — session grading periods × school-year types.

Parity target: `parquet/amt/base/academic_time_period_dim/main.py`.
Chain: sessions exploded on `gradingPeriods` (recordPath, `main.py:56-70`)
⋈ termDescriptors (inner on parsed code value, `main.py:116-124`)
⋈ gradingPeriodDescriptors (inner on parsed code value, `main.py:126-134`)
⋈ schoolYearTypes (inner on schoolYear, `main.py:136-144`)
⋈ gradingPeriods (inner on href ref id, `main.py:146-154`), then the
three composite keys (`main.py:159-177`) built with the grading period's
own beginDate (dashes stripped, no 8-char truncation — `.str.replace`).

All descriptor sides are broadcast — they are bounded vocabularies at any
data scale, so the only shuffle is the sessions × gradingPeriods equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.descriptors import (
    descriptor_code_value,
    ref_from_href,
)
from api_to_amt_data_lake_spark.functions.keys import sk_concat_strict
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import read_collection

CONTRACT = ViewContract(
    name="academicTimePeriodDim",
    columns=(
        "AcademicTimePeriodKey", "SchoolYear", "SchoolYearName",
        "IsCurrentSchoolYear", "SchoolKey", "SessionKey", "SessionName",
        "TermName", "GradingPeriodKey", "GradingPeriodName",
    ),
    types={"IsCurrentSchoolYear": "int"},
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    sessions = read_collection(spark, silver_root, school_year, "sessions")
    gps = read_collection(spark, silver_root, school_year, "gradingPeriods")
    gpd = read_collection(spark, silver_root, school_year,
                          "gradingPeriodDescriptors")
    td = read_collection(spark, silver_root, school_year, "termDescriptors")
    syt = read_collection(spark, silver_root, school_year, "schoolYearTypes")
    if any(x is None for x in (sessions, gps, gpd, td, syt)):
        return CONTRACT.empty(spark)

    sess = sessions.select(
        "sessionName",
        descriptor_code_value(F.col("termDescriptor")).alias("_term_cv"),
        F.explode("gradingPeriods").alias("_gp"),
    ).select(
        "sessionName", "_term_cv",
        F.col("_gp.gradingPeriodReference.schoolId").cast("string")
        .alias("SchoolKey"),
        F.col("_gp.gradingPeriodReference.schoolYear").alias("_sy"),
        descriptor_code_value(
            F.col("_gp.gradingPeriodReference.gradingPeriodDescriptor"))
        .alias("_gp_cv"),
        ref_from_href(F.col("_gp.gradingPeriodReference.link.href"))
        .alias("_gp_ref"),
    )
    terms = td.select(
        F.col("codeValue").alias("_term_cv"),
        F.col("codeValue").alias("TermName"),
        F.col("termDescriptorId").cast("string").alias("_term_id"),
    )
    gp_desc = gpd.select(
        F.col("codeValue").alias("_gp_cv"),
        F.col("codeValue").alias("GradingPeriodName"),
        F.col("gradingPeriodDescriptorId").cast("string").alias("_gpd_id"),
    )
    years = syt.select(
        F.col("schoolYear").alias("_sy"),
        F.col("currentSchoolYear").cast("int").alias("IsCurrentSchoolYear"),
        F.col("schoolYearDescription").alias("SchoolYearName"),
    )
    periods = gps.select(
        F.col("id").alias("_gp_ref"),
        F.regexp_replace(F.col("beginDate").cast("string"), "-", "")
        .alias("_gp_begin_key"),
    )

    result = (
        sess.join(F.broadcast(terms), "_term_cv", "inner")
        .join(F.broadcast(gp_desc), "_gp_cv", "inner")
        .join(F.broadcast(years), "_sy", "inner")
        .join(periods, "_gp_ref", "inner")
        .withColumn("SchoolYear", F.col("_sy").cast("string"))
    )
    return CONTRACT.conform(
        result.select(
            sk_concat_strict(
                "SchoolKey", "SchoolYear", "_term_id", "_gpd_id",
                "_gp_begin_key",
            ).alias("AcademicTimePeriodKey"),
            "SchoolYear", "SchoolYearName", "IsCurrentSchoolYear", "SchoolKey",
            sk_concat_strict("SchoolKey", "SchoolYear", "sessionName")
            .alias("SessionKey"),
            F.col("sessionName").alias("SessionName"),
            "TermName",
            sk_concat_strict("_gpd_id", "SchoolKey", "_gp_begin_key")
            .alias("GradingPeriodKey"),
            "GradingPeriodName",
        ),
        spark,
    )
