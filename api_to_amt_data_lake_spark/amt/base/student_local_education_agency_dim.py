"""student_local_education_agency_dim — per-student LEA demographics with
the digital-access indicator pivot.

Parity target: `parquet/amt/base/student_local_education_agency_dim/main.py`.
Chain: studentEducationOrganizationAssociations (descriptor parses +
null defaults, `main.py:185-241`) ⋈ localEducationAgencies (inner on edOrg
href ref, `main.py:284-292`) ⟕ the studentIndicators pivot (A10,
`main.py:245-280` — indicatorName → columns, values=indicator, missing →
'n/a') ⋈ students ⋈ active studentSchoolAssociations
(exitWithdrawDateKey >= today, nulls pass — `main.py:136-157`).

The 5-way filtered-fanout of the reference becomes one pivot (1 shuffle);
the LEA side is broadcast (LEAs are a small dimension at any scale).
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
from api_to_amt_data_lake_spark.operators.pivots import pivot_first
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    array_col,
    col_or_null,
    read_collection,
)

CONTRACT = ViewContract(
    name="studentLocalEducationAgencyDim",
    columns=(
        "StudentLocalEducationAgencyKey", "StudentKey",
        "LocalEducationAgencyKey", "StudentFirstName", "StudentMiddleName",
        "StudentLastName", "LimitedEnglishProficiency", "IsHispanic", "Sex",
        "InternetAccessInResidence", "InternetAccessTypeInResidence",
        "InternetPerformance", "DigitalDevice", "DeviceAccess",
    ),
)

INDICATORS = {
    "Internet Access In Residence": "InternetAccessInResidence",
    "Internet Access Type In Residence": "InternetAccessTypeInResidence",
    "Internet Performance": "InternetPerformance",
    "Digital Device": "DigitalDevice",
    "Device Access": "DeviceAccess",
}


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    seoa = read_collection(spark, silver_root, school_year,
                           "studentEducationOrganizationAssociations")
    students = read_collection(spark, silver_root, school_year, "students")
    ssa = read_collection(spark, silver_root, school_year,
                          "studentSchoolAssociations")
    leas = read_collection(spark, silver_root, school_year,
                           "localEducationAgencies")
    if any(x is None for x in (seoa, students, ssa, leas)):
        return CONTRACT.empty(spark)

    today_key = (run_date or _date.today().isoformat()).replace("-", "")[:8]

    stu = students.select(
        F.col("id").alias("_stu_ref"),
        F.col("studentUniqueId").cast("string").alias("StudentKey"),
        F.col("firstName").alias("StudentFirstName"),
        F.coalesce(col_or_null(students, "middleName"), F.lit(""))
        .alias("StudentMiddleName"),
        F.col("lastSurname").alias("StudentLastName"),
    )
    # Active enrollments only; the reference's 'nan' >= today quirk means a
    # null exitWithdrawDate passes the filter.
    exit_key = date_key(col_or_null(ssa, "exitWithdrawDate"))
    active = (
        ssa.select(
            ref_from_href(F.col("studentReference.link.href")).alias("_stu_ref"),
            exit_key.alias("_exit"),
        )
        .filter(F.col("_exit").isNull() | (F.col("_exit") >= today_key))
        .select("_stu_ref").distinct()
    )
    lea = leas.select(
        F.col("id").alias("_lea_ref"),
        F.col("localEducationAgencyId").cast("string")
        .alias("LocalEducationAgencyKey"),
    )
    assoc = seoa.select(
        F.col("id").alias("_seoa_id"),
        ref_from_href(col_or_null(seoa, "studentReference.link.href"))
        .alias("_stu_ref"),
        ref_from_href(
            col_or_null(seoa, "educationOrganizationReference.link.href"))
        .alias("_lea_ref"),
        F.coalesce(
            descriptor_code_value(
                col_or_null(seoa, "limitedEnglishProficiencyDescriptor")),
            F.lit("Not Applicable"),
        ).alias("LimitedEnglishProficiency"),
        F.coalesce(col_or_null(seoa, "hispanicLatinoEthnicity"), F.lit("0"))
        .alias("_hispanic"),
        F.coalesce(descriptor_code_value(col_or_null(seoa, "sexDescriptor")),
                   F.lit("")).alias("Sex"),
    )

    ind_src = seoa.select(
        F.col("id").alias("_seoa_id"),
        F.explode(array_col(
            seoa, "studentIndicators",
            "struct<indicatorName:string,indicator:string>"))
        .alias("_ind"),
    ).select(
        "_seoa_id",
        F.col("_ind.indicatorName").alias("indicatorName"),
        F.col("_ind.indicator").alias("indicator"),
    )
    indicators = pivot_first(
        ind_src, ["_seoa_id"], "indicatorName",
        list(INDICATORS), "indicator", rename=INDICATORS,
    )

    result = (
        assoc.join(F.broadcast(lea), "_lea_ref", "inner")
        .join(indicators, "_seoa_id", "left")
        .join(stu, "_stu_ref", "inner")
        .join(active, "_stu_ref", "inner")
        .withColumn(
            "IsHispanic",
            F.when(F.upper(F.col("_hispanic").cast("string")) == "TRUE", "1")
            .otherwise("0"),
        )
    )
    for dest in INDICATORS.values():
        result = result.withColumn(dest, F.coalesce(F.col(dest), F.lit("n/a")))
    return CONTRACT.conform(
        result.withColumn(
            "StudentLocalEducationAgencyKey",
            sk_concat_strict("StudentKey", "LocalEducationAgencyKey"),
        ),
        spark,
    )
