"""student_program_cohort_dim — cohort program membership for active
enrollments.

Parity target: `parquet/amt/equity/student_program_cohort_dim/main.py`.
Chain: studentCohortAssociations ⋈ cohorts exploded on `programs`
(recordPath, `main.py:90-109`) ⋈ cohortTypeDescriptors ⋈
programTypeDescriptors ⋈ studentSchoolAssociations ⋈
gradeLevelDescriptors, then active-enrollment filter
(exitWithdrawDate >= today; null exit passes — the reference's
'nan'-string quirk, `main.py:307`) and the 8/7-part surrogate keys
(`main.py:318-342`).

Descriptor sides broadcast; the only large shuffles are the association ⋈
cohort and ⋈ enrollment equi-joins on their natural keys.
"""

from __future__ import annotations

from datetime import date as _date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.descriptors import (
    descriptor_code_value,
    ref_from_href,
)
from api_to_amt_data_lake_spark.functions.keys import sk_concat_strict
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    col_or_null,
    read_collection,
)

CONTRACT = ViewContract(
    name="equity_StudentProgramCohortDim",
    columns=(
        "StudentProgramCohortKey", "StudentSchoolProgramKey",
        "StudentSchoolKey", "EntryGradeLevelDescriptor",
        "CohortTypeDescriptor", "CohortDescription", "ProgramName",
    ),
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    sca = read_collection(spark, silver_root, school_year,
                          "studentCohortAssociations")
    cohorts = read_collection(spark, silver_root, school_year, "cohorts")
    ssa = read_collection(spark, silver_root, school_year,
                          "studentSchoolAssociations")
    ctd = read_collection(spark, silver_root, school_year,
                          "cohortTypeDescriptors")
    gld = read_collection(spark, silver_root, school_year,
                          "gradeLevelDescriptors")
    ptd = read_collection(spark, silver_root, school_year,
                          "programTypeDescriptors")
    if any(x is None for x in (sca, cohorts, ssa, ctd, gld, ptd)):
        return CONTRACT.empty(spark)

    today_key = (run_date or _date.today().isoformat()).replace("-", "")[:8]

    assoc = sca.select(
        ref_from_href(F.col("cohortReference.link.href")).alias("_cohort_id"),
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("studentKey"),
        date_key(col_or_null(sca, "beginDate")).alias("beginDateKey"),
    )
    cohort = cohorts.select(
        F.col("id").alias("_cohort_id"),
        F.col("cohortIdentifier").cast("string").alias("cohortIdentifier"),
        col_or_null(cohorts, "cohortDescription").alias("CohortDescription"),
        descriptor_code_value(F.col("cohortTypeDescriptor")).alias("_ct_cv"),
        F.col("educationOrganizationReference.educationOrganizationId")
        .cast("string").alias("educationOrganizationId"),
        F.explode("programs").alias("_prog"),
    ).select(
        "_cohort_id", "cohortIdentifier", "CohortDescription", "_ct_cv",
        "educationOrganizationId",
        F.col("_prog.programReference.educationOrganizationId").cast("string")
        .alias("programEducationOrganizationId"),
        F.col("_prog.programReference.programName").alias("ProgramName"),
        descriptor_code_value(
            F.col("_prog.programReference.programTypeDescriptor"))
        .alias("_pt_cv"),
    )
    cohort_types = ctd.select(
        F.col("codeValue").alias("_ct_cv"),
        F.col("description").alias("CohortTypeDescriptor"),
    )
    prog_types = ptd.select(
        F.col("codeValue").alias("_pt_cv"),
        F.col("programTypeDescriptorId").cast("string").alias("_pt_id"),
    )
    grade_levels = gld.select(
        F.col("codeValue").alias("_gl_cv"),
        F.col("description").alias("EntryGradeLevelDescriptor"),
    )
    enroll = ssa.select(
        F.col("schoolReference.schoolId").cast("string").alias("schoolKey"),
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("studentKey"),
        date_key(col_or_null(ssa, "exitWithdrawDate")).alias("_exit"),
        descriptor_code_value(col_or_null(ssa, "entryGradeLevelDescriptor"))
        .alias("_gl_cv"),
    ).join(F.broadcast(grade_levels), "_gl_cv", "inner")

    result = (
        assoc.join(cohort, "_cohort_id", "inner")
        .join(F.broadcast(cohort_types), "_ct_cv", "inner")
        .join(F.broadcast(prog_types), "_pt_cv", "inner")
        .join(enroll, "studentKey", "inner")
        .filter(F.col("_exit").isNull() | (F.col("_exit") >= today_key))
    )
    program_key = sk_concat_strict(
        "studentKey", "schoolKey", "ProgramName", "_pt_id",
        "educationOrganizationId", "programEducationOrganizationId",
        "beginDateKey",
    )
    return CONTRACT.conform(
        result.select(
            sk_concat_strict(program_key, "cohortIdentifier")
            .alias("StudentProgramCohortKey"),
            program_key.alias("StudentSchoolProgramKey"),
            sk_concat_strict("studentKey", "schoolKey")
            .alias("StudentSchoolKey"),
            "EntryGradeLevelDescriptor", "CohortTypeDescriptor",
            "CohortDescription", "ProgramName",
        ),
        spark,
    )
