"""all_student_school_dim — every enrollment with student demographics,
school-vs-district coalesced indicators, and enrollment status.

Parity target: `parquet/amt/base/all_student_school_dim/main.py`
(RESULT_COLUMNS `main.py:34-55`). The reference's filtered-fanout idiom —
the studentIndicators child joined 5× per education-organization level
(J8, `main.py:196-265` school, `main.py:335-404` district) — collapses
here into ONE pivot per level (`pivot_first`), then a single left join
per level; 10 shuffling joins become 2 (SURVEY.md §2.3 J8 preferred
idiom).

Coalesce cascade (F13, `main.py:428-487`): school-level edOrg value wins
when non-empty, else district-level, else the typed default
('Not applicable' for LEP, 'n/a' for indicators, False→0 for IsHispanic).
IsEnrolled: open or future exit date (`main.py:572-580`).
"""

from __future__ import annotations

from datetime import date as _date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.descriptors import descriptor_code_value
from api_to_amt_data_lake_spark.operators.pivots import pivot_first
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    col_or_null,
    read_collection,
)

CONTRACT = ViewContract(
    name="allStudentSchoolDim",
    columns=(
        "AllStudentSchoolKey", "StudentSchoolKey", "StudentKey", "SchoolKey",
        "SchoolYear", "StudentFirstName", "StudentMiddleName", "StudentLastName",
        "BirthDate", "EnrollmentDateKey", "GradeLevel",
        "LimitedEnglishProficiency", "IsHispanic", "Sex",
        "InternetAccessInResidence", "InternetAccessTypeInResidence",
        "InternetPerformance", "DigitalDevice", "DeviceAccess", "IsEnrolled",
        "ExitWithdrawDate",
    ),
    types={"IsHispanic": "int", "IsEnrolled": "int"},
)

_INDICATORS = [
    "Internet Access In Residence", "Internet Access Type In Residence",
    "Internet Performance In Residence", "Digital Device", "Device Access",
]
_IND_COLS = ["_internet", "_internet_type", "_internet_perf", "_device",
             "_device_access"]


def _ed_org(edorg: DataFrame) -> DataFrame:
    """Demographics + pivoted studentIndicators per edOrg association."""
    demo = edorg.select(
        F.col("id").alias("_eo_id"),
        F.col("educationOrganizationReference.educationOrganizationId")
        .cast("string").alias("_eo_org"),
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("_eo_student"),
        (F.col("hispanicLatinoEthnicity")
         if "hispanicLatinoEthnicity" in edorg.columns
         else F.lit(None).cast("boolean")).alias("_hispanic"),
        descriptor_code_value(F.coalesce(
            F.col("limitedEnglishProficiencyDescriptor")
            if "limitedEnglishProficiencyDescriptor" in edorg.columns
            else F.lit(None).cast("string"),
            F.lit(""))).alias("_lep"),
        descriptor_code_value(
            F.col("sexDescriptor") if "sexDescriptor" in edorg.columns
            else F.lit(None).cast("string")).alias("_sex"),
    )
    if "studentIndicators" in edorg.columns:
        ind = edorg.select(
            F.col("id").alias("_eo_id"),
            F.explode("studentIndicators").alias("_ind"),
        ).select(
            "_eo_id",
            F.col("_ind.indicatorName").alias("_name"),
            F.col("_ind.indicator").alias("_value"),
        )
        piv = pivot_first(ind, ["_eo_id"], "_name", _INDICATORS, "_value",
                          rename=dict(zip(_INDICATORS, _IND_COLS)))
        demo = demo.join(piv, "_eo_id", "left")
    else:
        for c in _IND_COLS:
            demo = demo.withColumn(c, F.lit(None).cast("string"))
    return demo.drop("_eo_id")


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    ssa = read_collection(spark, silver_root, school_year,
                          "studentSchoolAssociations")
    students = read_collection(spark, silver_root, school_year, "students")
    schools = read_collection(spark, silver_root, school_year, "schools")
    edorg = read_collection(spark, silver_root, school_year,
                            "studentEducationOrganizationAssociations")
    if ssa is None or students is None or schools is None:
        return CONTRACT.empty(spark)

    enroll = ssa.select(
        F.col("schoolReference.schoolId").cast("string").alias("SchoolKey"),
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("StudentKey"),
        F.col("schoolYearTypeReference.schoolYear").cast("string").alias("_year"),
        F.col("entryDate").cast("string").alias("EnrollmentDateKey"),
        descriptor_code_value(col_or_null(ssa, "entryGradeLevelDescriptor"))
        .alias("GradeLevel"),
        col_or_null(ssa, "exitWithdrawDate").alias("ExitWithdrawDate"),
    )
    stu = students.select(
        F.col("studentUniqueId").cast("string").alias("_stu_id"),
        F.col("birthDate").cast("string").alias("BirthDate"),
        F.col("firstName").alias("StudentFirstName"),
        (F.col("middleName") if "middleName" in students.columns
         else F.lit(None).cast("string")).alias("StudentMiddleName"),
        F.col("lastSurname").alias("StudentLastName"),
    )
    sch = schools.select(
        F.col("schoolId").cast("string").alias("_sch_id"),
        F.col("localEducationAgencyReference.localEducationAgencyId")
        .cast("string").alias("_lea_id"),
    )
    base = (
        enroll.join(stu, enroll.StudentKey == stu._stu_id, "inner")
        .join(F.broadcast(sch), enroll.SchoolKey == sch._sch_id, "inner")
    )

    if edorg is not None:
        eo = _ed_org(edorg)
        school_lvl = eo.select(
            F.col("_eo_student").alias("_s_student"),
            F.col("_eo_org").alias("_s_org"),
            *[F.col(c).alias(f"_s{c}") for c in
              ("_hispanic", "_lep", "_sex", *_IND_COLS)],
        )
        district_lvl = eo.select(
            F.col("_eo_student").alias("_d_student"),
            F.col("_eo_org").alias("_d_org"),
            *[F.col(c).alias(f"_d{c}") for c in
              ("_hispanic", "_lep", "_sex", *_IND_COLS)],
        )
        base = base.join(
            school_lvl,
            (base.StudentKey == school_lvl._s_student)
            & (base.SchoolKey == school_lvl._s_org), "left",
        ).join(
            district_lvl,
            (base.StudentKey == district_lvl._d_student)
            & (base._lea_id == district_lvl._d_org), "left",
        )
    else:
        for c in ("_hispanic", "_lep", "_sex", *_IND_COLS):
            base = base.withColumn(f"_s{c}", F.lit(None).cast(
                "boolean" if c == "_hispanic" else "string"))
            base = base.withColumn(f"_d{c}", F.lit(None).cast(
                "boolean" if c == "_hispanic" else "string"))

    def school_else_district(c: str, default):
        s = F.col(f"_s{c}").cast("string")
        d = F.col(f"_d{c}").cast("string")
        v = F.when((s.isNotNull()) & (s != ""), s).otherwise(d)
        return F.when(v.isNull() | (v == ""), default).otherwise(v)

    today_key = (run_date or _date.today().isoformat()).replace("-", "")[:8]
    exit_key = date_key("ExitWithdrawDate")
    is_enrolled = F.when(
        F.col("ExitWithdrawDate").isNull() | (exit_key > today_key), 1
    ).otherwise(0)
    # pandas bool stringifies as 'True'/'False'; compare the raw bools.
    is_hispanic = F.coalesce(
        F.col("_s_hispanic"), F.col("_d_hispanic"), F.lit(False)
    ).cast("int")

    return CONTRACT.conform(
        base.select(
            F.concat_ws("-", "StudentKey", "SchoolKey",
                        date_key("EnrollmentDateKey"))
            .alias("AllStudentSchoolKey"),
            F.concat_ws("-", "StudentKey", "SchoolKey").alias("StudentSchoolKey"),
            "StudentKey", "SchoolKey",
            F.coalesce(F.col("_year"), F.lit("Unknown")).alias("SchoolYear"),
            "StudentFirstName", "StudentMiddleName", "StudentLastName",
            "BirthDate", "EnrollmentDateKey", "GradeLevel",
            school_else_district("_lep", F.lit("Not applicable"))
            .alias("LimitedEnglishProficiency"),
            is_hispanic.alias("IsHispanic"),
            school_else_district("_sex", F.lit("")).alias("Sex"),
            school_else_district("_internet", F.lit("n/a"))
            .alias("InternetAccessInResidence"),
            school_else_district("_internet_type", F.lit("n/a"))
            .alias("InternetAccessTypeInResidence"),
            school_else_district("_internet_perf", F.lit("n/a"))
            .alias("InternetPerformance"),
            school_else_district("_device", F.lit("n/a")).alias("DigitalDevice"),
            school_else_district("_device_access", F.lit("n/a"))
            .alias("DeviceAccess"),
            is_enrolled.alias("IsEnrolled"),
            "ExitWithdrawDate",
        ),
        spark,
    )
