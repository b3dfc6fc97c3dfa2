"""student_section_grade_fact — section grades with grading-period keys.

Parity target: `parquet/amt/ews/student_section_grade_fact/main.py`
(RESULT_COLUMNS `main.py:23-32`). Semantics:
- grades left-join gradingPeriods on the 4-part grading-period reference
  (brings the period's beginDate into GradingPeriodKey).
- S10 inline letter-grade lookup: a numeric grade of exactly 0 falls back
  to the letter-grade translation (A→95 … F→55) — F12 conditional
  (`main.py:152`).
- inner join to gradingPeriodDescriptors on parsed code value.
- GradeType kept only for GradingPeriod / Semester / Final crosswalk
  constants (P5 OR-chain, `main.py:236-238`).
- GradeType output is the *parsed code value* of gradeTypeDescriptor
  (renamed after `get_descriptor_code_value_from_uri`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.descriptors import descriptor_code_value
from api_to_amt_data_lake_spark.functions.keys import sk_concat_strict
from api_to_amt_data_lake_spark.functions.nulls import null_to_empty
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    col_or_null,
    read_collection,
)
from api_to_amt_data_lake_spark.sources.lookup import (
    letter_grade_lookup_df,
    with_descriptor_constant,
)

CONTRACT = ViewContract(
    name="ews_studentSectionGradeFact",
    columns=(
        "StudentKey", "SchoolKey", "GradingPeriodKey", "StudentSectionKey",
        "SectionKey", "NumericGradeEarned", "LetterGradeEarned", "GradeType",
    ),
    types={"NumericGradeEarned": "double"},
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    grades = read_collection(spark, silver_root, school_year, "grades")
    periods = read_collection(spark, silver_root, school_year, "gradingPeriods")
    descriptors = read_collection(spark, silver_root, school_year,
                                  "gradingPeriodDescriptors")
    if grades is None or periods is None or descriptors is None:
        return CONTRACT.empty(spark)

    g = grades.select(
        F.col("gradingPeriodReference.gradingPeriodDescriptor").alias("_gp_uri"),
        F.col("gradingPeriodReference.periodSequence").alias("_gp_seq"),
        F.col("gradingPeriodReference.schoolId").alias("_gp_school"),
        F.col("gradingPeriodReference.schoolYear").alias("_gp_year"),
        col_or_null(grades, "letterGradeEarned").alias("_letter"),
        col_or_null(grades, "numericGradeEarned", "double").alias("_numeric"),
        F.col("studentSectionAssociationReference.studentUniqueId")
        .cast("string").alias("StudentKey"),
        F.col("studentSectionAssociationReference.schoolId").cast("string")
        .alias("SchoolKey"),
        date_key(F.col("studentSectionAssociationReference.beginDate"))
        .alias("_ssa_begin"),
        F.col("studentSectionAssociationReference.localCourseCode").alias("_lcc"),
        F.col("studentSectionAssociationReference.schoolYear").cast("string")
        .alias("_sy"),
        F.col("studentSectionAssociationReference.sectionIdentifier")
        .alias("_sid"),
        F.col("studentSectionAssociationReference.sessionName").alias("_sess"),
        F.col("gradeTypeDescriptor").alias("gradeTypeDescriptor"),
    )
    p = periods.select(
        F.col("gradingPeriodDescriptor").alias("_gp_uri"),
        F.col("periodSequence").alias("_gp_seq"),
        F.col("schoolReference.schoolId").alias("_gp_school"),
        F.col("schoolYearTypeReference.schoolYear").alias("_gp_year"),
        date_key("beginDate").alias("_gp_begin"),
    )
    joined = g.join(p, ["_gp_uri", "_gp_seq", "_gp_school", "_gp_year"], "left")

    lookup = F.broadcast(letter_grade_lookup_df(spark))
    joined = joined.join(
        lookup, joined._letter == lookup.LetterGradeEarned, "left")
    numeric = F.when(
        F.col("_numeric") == 0,
        F.col("NumericGradeEarnedJoin").cast("double")
    ).otherwise(F.col("_numeric"))

    d = descriptors.select(
        F.col("codeValue").alias("_gp_cv"),
        F.col("gradingPeriodDescriptorId").cast("string").alias("_gp_id"),
    )
    joined = joined.join(
        F.broadcast(d),
        descriptor_code_value("_gp_uri") == d._gp_cv, "inner")

    typed = with_descriptor_constant(joined, "gradeTypeDescriptor")
    kept = typed.filter(
        F.coalesce(F.col("gradeTypeDescriptor_constantName"), F.lit(""))
        .rlike("GradeType\\.(GradingPeriod|Semester|Final)")
    )
    return CONTRACT.conform(
        kept.select(
            "StudentKey", "SchoolKey",
            sk_concat_strict("_gp_id", "SchoolKey", "_gp_begin")
            .alias("GradingPeriodKey"),
            sk_concat_strict("StudentKey", "SchoolKey", "_lcc", "_sy", "_sid",
                             "_sess", "_ssa_begin").alias("StudentSectionKey"),
            sk_concat_strict("SchoolKey", "_lcc", "_sy", "_sid", "_sess")
            .alias("SectionKey"),
            numeric.alias("NumericGradeEarned"),
            null_to_empty("_letter").alias("LetterGradeEarned"),
            descriptor_code_value("gradeTypeDescriptor").alias("GradeType"),
        ),
        spark,
    )
