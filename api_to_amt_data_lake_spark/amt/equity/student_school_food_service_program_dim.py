"""student_school_food_service_program_dim — food-service program services
per active enrollment.

Parity target:
`parquet/amt/equity/student_school_food_service_program_dim/main.py`.
Chain: studentSchoolFoodServiceProgramAssociations exploded on
`schoolFoodServiceProgramServices` (recordPath, `main.py:51-67`) ⟕
programTypeDescriptors ⟕ schoolFoodServiceProgramServiceDescriptors (both
on parsed code value, `main.py:120-161`) ⋈ studentSchoolAssociations on
student (`main.py:192-200`), active filter exitWithdrawDate >= today
(null passes, `main.py:206`), then the 8/7-part keys (`main.py:216-239`).
"""

from __future__ import annotations

from datetime import date as _date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.descriptors import (
    descriptor_code_value,
)
from api_to_amt_data_lake_spark.functions.keys import sk_concat_strict
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    col_or_null,
    read_collection,
)

CONTRACT = ViewContract(
    name="equity_StudentSchoolFoodServiceProgramDim",
    columns=(
        "StudentSchoolFoodServiceProgramKey", "StudentSchoolProgramKey",
        "StudentSchoolKey", "ProgramName",
        "SchoolFoodServiceProgramServiceDescriptor",
    ),
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    sfspa = read_collection(spark, silver_root, school_year,
                            "studentSchoolFoodServiceProgramAssociations")
    ssa = read_collection(spark, silver_root, school_year,
                          "studentSchoolAssociations")
    ptd = read_collection(spark, silver_root, school_year,
                          "programTypeDescriptors")
    sfsd = read_collection(spark, silver_root, school_year,
                           "schoolFoodServiceProgramServiceDescriptors")
    if any(x is None for x in (sfspa, ssa, ptd, sfsd)):
        return CONTRACT.empty(spark)

    today_key = (run_date or _date.today().isoformat()).replace("-", "")[:8]

    assoc = sfspa.select(
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("studentUniqueId"),
        F.col("programReference.programName").alias("ProgramName"),
        descriptor_code_value(F.col("programReference.programTypeDescriptor"))
        .alias("_pt_cv"),
        F.col("programReference.educationOrganizationId").cast("string")
        .alias("programEducationOrganizationId"),
        date_key(col_or_null(sfspa, "beginDate")).alias("_begin_key"),
        F.col("educationOrganizationReference.educationOrganizationId")
        .cast("string").alias("educationOrganizationId"),
        F.explode("schoolFoodServiceProgramServices").alias("_svc"),
    ).select(
        "studentUniqueId", "ProgramName", "_pt_cv",
        "programEducationOrganizationId", "_begin_key",
        "educationOrganizationId",
        descriptor_code_value(
            F.col("_svc.schoolFoodServiceProgramServiceDescriptor"))
        .alias("_svc_cv"),
    )
    prog_types = ptd.select(
        F.col("codeValue").alias("_pt_cv"),
        F.col("programTypeDescriptorId").cast("string").alias("_pt_id"),
    )
    svc_types = sfsd.select(
        F.col("codeValue").alias("_svc_cv"),
        F.col("schoolFoodServiceProgramServiceDescriptorId").cast("string")
        .alias("_svc_id"),
    )
    enroll = ssa.select(
        F.col("schoolReference.schoolId").cast("string").alias("schoolId"),
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("studentUniqueId"),
        date_key(col_or_null(ssa, "exitWithdrawDate")).alias("_exit"),
    )

    result = (
        enroll.join(assoc, "studentUniqueId", "inner")
        .join(F.broadcast(prog_types), "_pt_cv", "left")
        .join(F.broadcast(svc_types), "_svc_cv", "left")
        .filter(F.col("_exit").isNull() | (F.col("_exit") >= today_key))
    )
    program_key = sk_concat_strict(
        "studentUniqueId", "schoolId", "ProgramName", "_pt_id",
        "educationOrganizationId", "programEducationOrganizationId",
        "_begin_key",
    )
    return CONTRACT.conform(
        result.select(
            sk_concat_strict(program_key, "_svc_id")
            .alias("StudentSchoolFoodServiceProgramKey"),
            program_key.alias("StudentSchoolProgramKey"),
            sk_concat_strict("studentUniqueId", "schoolId")
            .alias("StudentSchoolKey"),
            "ProgramName",
            F.col("_svc_cv").alias("SchoolFoodServiceProgramServiceDescriptor"),
        ),
        spark,
    )
