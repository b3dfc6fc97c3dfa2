"""rls_user_student_data_authorization — (staff, student) visibility pairs.

Parity target: `parquet/amt/rls/rls_user_student_data_authorization/main.py`.
Three scope branches over staffEducationOrganizationAssignmentAssociations
(crosswalked to AuthorizationScope.*, `main.py:68-77`), each ending in an
active-assignment filter (`endDateKey >= today`) and an active-enrollment
filter (`exitWithdrawDateKey >= today`, exit defaulting to 2199-12-31,
`helper replace_null main.py:163`):

- District (`main.py:253-296`): edOrg ref = LEA ref → schools →
  studentSchoolAssociations on the school resource id.
- School (`main.py:297-338`): edOrg ref = school resource id → schools →
  SSA on (school resource id, schoolId).
- Section (`main.py:339-398`): staff ref → staffSectionAssociations →
  studentSectionAssociations on (edOrgId = section schoolId, section
  resource id), section endDate live, → SSA on (schoolId, student).

UNION ALL + distinct (`main.py:399-413`, O4).

Null quirks preserved: a *null* endDate on an existing column renders as
the string 'nan' in the reference (`pandasWrapper.py:143-144`), which
passes `>= today` — we coalesce null date keys to the same always-pass
sentinel.

Scale: schools is broadcast-sized; the SSA joins shuffle on school/student
ids. Each branch pre-filters its scope slice before joining, so no branch
fans out rows it will discard.
"""

from __future__ import annotations

from datetime import date as _date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.descriptors import ref_from_href
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    col_or_null,
    read_collection,
)
from api_to_amt_data_lake_spark.sources.lookup import with_descriptor_constant

CONTRACT = ViewContract(
    name="rls_UserStudentDataAuthorization",
    columns=("UserKey", "StudentKey"),
)

_OPEN = "21991231"


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    edorg = read_collection(
        spark, silver_root, school_year,
        "staffEducationOrganizationAssignmentAssociations")
    ssa = read_collection(spark, silver_root, school_year,
                          "studentSchoolAssociations")
    schools = read_collection(spark, silver_root, school_year, "schools")
    stu_sec = read_collection(spark, silver_root, school_year,
                              "studentSectionAssociations")
    staff_sec = read_collection(spark, silver_root, school_year,
                                "staffSectionAssociations")
    if edorg is None or ssa is None or schools is None:
        return CONTRACT.empty(spark)

    today_key = (run_date or _date.today().isoformat()).replace("-", "")[:8]

    assignments = with_descriptor_constant(
        edorg.select(
            F.col("staffReference.staffUniqueId").cast("string")
            .alias("UserKey"),
            F.col("staffClassificationDescriptor")
            .alias("staffClassificationDescriptor"),
            F.col("educationOrganizationReference.educationOrganizationId")
            .cast("string").alias("_ed_org_id"),
            ref_from_href(
                col_or_null(edorg, "educationOrganizationReference.link.href"))
            .alias("_ed_org_ref_id"),
            ref_from_href(col_or_null(edorg, "staffReference.link.href"))
            .alias("_staff_ref_id"),
            F.coalesce(date_key(col_or_null(edorg, "endDate")), F.lit(_OPEN))
            .alias("_end_key"),
        ),
        "staffClassificationDescriptor",
    ).select(
        "UserKey", "_ed_org_id", "_ed_org_ref_id", "_staff_ref_id",
        F.col("staffClassificationDescriptor_constantName").alias("_scope"),
        "_end_key",
    )
    # The edOrg-assignment end-date filter applies to the District and
    # School branches only (`main.py:283-285,324-326`) — the Section branch
    # gates on the STUDENT section end date instead (`main.py:383-385`).
    live = assignments.filter(F.col("_end_key") >= today_key)

    school_xref = F.broadcast(schools.select(
        F.col("id").alias("_school_ref_id"),
        F.col("schoolId").cast("string").alias("_school_id"),
        ref_from_href(
            col_or_null(schools, "localEducationAgencyReference.link.href"))
        .alias("_lea_ref_id"),
    ))

    enrollments = ssa.select(
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("StudentKey"),
        ref_from_href(col_or_null(ssa, "schoolReference.link.href"))
        .alias("_school_ref_id"),
        F.col("schoolReference.schoolId").cast("string").alias("_school_id"),
        F.coalesce(date_key(col_or_null(ssa, "exitWithdrawDate")),
                   F.lit(_OPEN)).alias("_exit_key"),
    ).filter(F.col("_exit_key") >= today_key)

    # District scope: LEA ref → all its schools → their enrollments.
    district = (
        live.filter(F.col("_scope") == "AuthorizationScope.District")
        .withColumnRenamed("_ed_org_ref_id", "_lea_ref_id")
        .join(school_xref, "_lea_ref_id", "inner")
        .join(enrollments, "_school_ref_id", "inner")
        .select("UserKey", "StudentKey")
    )

    # School scope: edOrg ref is the school resource id.
    school = (
        live.filter(F.col("_scope") == "AuthorizationScope.School")
        .withColumnRenamed("_ed_org_ref_id", "_school_ref_id")
        .join(school_xref, "_school_ref_id", "inner")
        .join(enrollments, ["_school_ref_id", "_school_id"], "inner")
        .select("UserKey", "StudentKey")
    )

    # Section scope: staff's live sections ∩ students' live sections.
    parts = [district, school]
    if staff_sec is not None and stu_sec is not None:
        staff_sections = staff_sec.select(
            ref_from_href(col_or_null(staff_sec, "staffReference.link.href"))
            .alias("_staff_ref_id"),
            ref_from_href(col_or_null(staff_sec, "sectionReference.link.href"))
            .alias("_section_ref_id"),
        ).dropDuplicates()
        student_sections = stu_sec.select(
            F.col("studentReference.studentUniqueId").cast("string")
            .alias("StudentKey"),
            F.col("sectionReference.schoolId").cast("string")
            .alias("_stu_school_id"),
            ref_from_href(col_or_null(stu_sec, "sectionReference.link.href"))
            .alias("_stu_section_ref_id"),
            F.coalesce(date_key(col_or_null(stu_sec, "endDate")),
                       F.lit(_OPEN)).alias("_sec_end_key"),
        ).filter(F.col("_sec_end_key") >= today_key)
        section = (
            assignments.filter(F.col("_scope") == "AuthorizationScope.Section")
            .join(staff_sections, "_staff_ref_id", "inner")
            .join(student_sections,
                  (F.col("_ed_org_id") == F.col("_stu_school_id"))
                  & (F.col("_section_ref_id") == F.col("_stu_section_ref_id")),
                  "inner")
            .select("UserKey", "StudentKey",
                    F.col("_stu_school_id").alias("_school_id"))
            .join(enrollments.select("StudentKey", "_school_id"),
                  ["StudentKey", "_school_id"], "inner")
            .select("UserKey", "StudentKey")
        )
        parts.append(section)

    result = parts[0]
    for p in parts[1:]:
        result = result.unionByName(p)
    return CONTRACT.conform(result.dropDuplicates(), spark)
