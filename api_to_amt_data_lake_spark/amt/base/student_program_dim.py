"""student_program_dim — program enrollments for currently-enrolled
students.

Parity target: `parquet/amt/base/student_program_dim/main.py`. Chain:
studentProgramAssociations ⋈ programTypeDescriptors (inner, on parsed
code value) ⋈ studentSchoolAssociations (inner on student — fanout per
school enrollment) ⋈ programs (inner on href ref id + program edOrg),
then the active-enrollment filter exitWithdrawDateKey >= today
(null exit stringifies to 'nan' in the reference → passes) and the
7-part surrogate key (`main.py:203-211`).
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
    name="studentProgramDim",
    columns=(
        "StudentSchoolProgramKey", "BeginDateKey", "EducationOrganizationId",
        "ProgramName", "StudentKey", "SchoolKey", "StudentSchoolKey",
        "EducationOrganizationKey",
    ),
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    spa = read_collection(spark, silver_root, school_year,
                          "studentProgramAssociations")
    programs = read_collection(spark, silver_root, school_year, "programs")
    ssa = read_collection(spark, silver_root, school_year,
                          "studentSchoolAssociations")
    ptd = read_collection(spark, silver_root, school_year,
                          "programTypeDescriptors")
    if spa is None or programs is None or ssa is None or ptd is None:
        return CONTRACT.empty(spark)

    today_key = (run_date or _date.today().isoformat()).replace("-", "")[:8]

    assoc = spa.select(
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("StudentKey"),
        date_key(col_or_null(spa, "beginDate")).alias("BeginDateKey"),
        F.col("programReference.programName").alias("ProgramName"),
        descriptor_code_value(F.col("programReference.programTypeDescriptor"))
        .alias("_ptype_cv"),
        F.col("programReference.educationOrganizationId").cast("string")
        .alias("EducationOrganizationId"),
        ref_from_href(F.col("programReference.link.href")).alias("_prog_ref"),
        F.col("educationOrganizationReference.educationOrganizationId")
        .cast("string").alias("EducationOrganizationKey"),
    )
    types = ptd.select(
        F.col("codeValue").alias("_ptype_cv"),
        F.col("programTypeDescriptorId").cast("string").alias("_ptype_id"),
    )
    enroll = ssa.select(
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("StudentKey"),
        F.col("schoolReference.schoolId").cast("string").alias("SchoolKey"),
        date_key(col_or_null(ssa, "exitWithdrawDate")).alias("_exit"),
    )
    progs = programs.select(
        F.col("id").alias("_prog_id_r"),
        F.col("educationOrganizationReference.educationOrganizationId")
        .cast("string").alias("_prog_org"),
    )
    result = (
        assoc.join(F.broadcast(types), "_ptype_cv", "inner")
        .join(enroll, "StudentKey", "inner")
        .join(progs,
              (F.col("_prog_ref") == F.col("_prog_id_r"))
              & (F.col("EducationOrganizationId") == F.col("_prog_org")),
              "inner")
        .filter(F.col("_exit").isNull() | (F.col("_exit") >= today_key))
    )
    return CONTRACT.conform(
        result.select(
            sk_concat_strict(
                "StudentKey", "SchoolKey", "ProgramName", "_ptype_id",
                "EducationOrganizationKey", "EducationOrganizationId",
                "BeginDateKey",
            ).alias("StudentSchoolProgramKey"),
            "BeginDateKey", "EducationOrganizationId", "ProgramName",
            "StudentKey", "SchoolKey",
            sk_concat_strict("StudentKey", "SchoolKey").alias("StudentSchoolKey"),
            "EducationOrganizationKey",
        ),
        spark,
    )
