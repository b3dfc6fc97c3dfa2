"""rls_user_authorization — per-staff row-level-security scope row.

Parity target: `parquet/amt/rls/rls_user_authorization/main.py`.
staffEducationOrganizationAssignmentAssociations crosswalked to
`AuthorizationScope.{District,School,Section}` (`main.py:66-78`), then:

- District/School scope: one row per assignment, permissions 'ALL'/edOrg
  (`main.py:169-175,186-196` — the `UserScope_DistrictOrSchool` branch of
  the Result filter keeps these regardless of section matches).
- Section scope: joined to staffSectionAssociations on the staff resource
  id (`main.py:156-166`), kept only while the section assignment is live
  (`endDateKey >= today AND id`, `main.py:186-196`); permissions carry the
  section resource id and the 5-part section key (`main.py:199-206,
  217-236`).

Spark-first deviation (same result set): the reference LEFT-joins every
assignment to sections and then filters + drop_duplicates
(`main.py:156-196,282`) — District/School rows fan out k× and collapse
again. We join ONLY the Section-scope slice and union the
District/School slice untouched: no fan-out, no dedup shuffle of rows
whose permissions never depended on sections. A final dropDuplicates
reproduces the reference's `drop_duplicates()` (`main.py:282`).

Null handling: unmatched crosswalk rows (null constantName) are dropped —
the reference's `.str.contains` without `na=False` would raise on them;
real descriptors always match the crosswalk.
"""

from __future__ import annotations

from datetime import date as _date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.descriptors import ref_from_href
from api_to_amt_data_lake_spark.functions.keys import sk_concat_strict
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    col_or_null,
    read_collection,
)
from api_to_amt_data_lake_spark.sources.lookup import with_descriptor_constant

CONTRACT = ViewContract(
    name="rls_UserAuthorization",
    columns=("UserKey", "UserScope", "StudentPermission", "SectionPermission",
             "SectionKeyPermission", "SchoolPermission", "DistrictId"),
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    edorg = read_collection(
        spark, silver_root, school_year,
        "staffEducationOrganizationAssignmentAssociations")
    staff_sec = read_collection(spark, silver_root, school_year,
                                "staffSectionAssociations")
    if edorg is None:
        return CONTRACT.empty(spark)

    today_key = (run_date or _date.today().isoformat()).replace("-", "")[:8]

    scoped = with_descriptor_constant(
        edorg.select(
            F.col("staffReference.staffUniqueId").cast("string")
            .alias("UserKey"),
            F.col("staffClassificationDescriptor")
            .alias("staffClassificationDescriptor"),
            F.col("educationOrganizationReference.educationOrganizationId")
            .cast("string").alias("educationOrganizationId"),
            ref_from_href(col_or_null(edorg, "staffReference.link.href"))
            .alias("_staff_ref_id"),
        ),
        "staffClassificationDescriptor",
    ).select(
        "UserKey", "educationOrganizationId", "_staff_ref_id",
        F.col("staffClassificationDescriptor_constantName").alias("UserScope"),
    ).filter(
        F.col("UserScope").contains("AuthorizationScope.District")
        | F.col("UserScope").contains("AuthorizationScope.School")
        | F.col("UserScope").contains("AuthorizationScope.Section")
    )

    district_school = scoped.filter(
        (F.col("UserScope") == "AuthorizationScope.District")
        | (F.col("UserScope") == "AuthorizationScope.School")
    ).select(
        "UserKey", "UserScope",
        F.lit("ALL").alias("StudentPermission"),
        F.lit("ALL").alias("SectionPermission"),
        F.lit("ALL").alias("SectionKeyPermission"),
        F.when(F.col("UserScope") == "AuthorizationScope.District",
               F.lit("ALL"))
        .otherwise(F.col("educationOrganizationId")).alias("SchoolPermission"),
        F.when(F.col("UserScope") == "AuthorizationScope.District",
               F.col("educationOrganizationId"))
        .otherwise(F.lit("")).alias("DistrictId"),
    )

    section_scope = scoped.filter(
        F.col("UserScope") == "AuthorizationScope.Section")
    if staff_sec is not None:
        live_sections = staff_sec.select(
            ref_from_href(col_or_null(staff_sec, "staffReference.link.href"))
            .alias("_staff_ref_id"),
            ref_from_href(col_or_null(staff_sec, "sectionReference.link.href"))
            .alias("_section_ref_id"),
            F.col("sectionReference.schoolId").cast("string").alias("_school"),
            F.col("sectionReference.localCourseCode").alias("_course"),
            F.col("sectionReference.schoolYear").cast("string").alias("_year"),
            F.col("sectionReference.sectionIdentifier").alias("_section"),
            F.col("sectionReference.sessionName").alias("_session"),
            F.coalesce(date_key(col_or_null(staff_sec, "endDate")),
                       F.lit("21991231")).alias("_end_key"),
        ).filter(F.col("_end_key") >= today_key).dropDuplicates()
        section_rows = section_scope.join(
            live_sections, "_staff_ref_id", "inner",
        ).select(
            "UserKey", "UserScope",
            F.lit("ALL").alias("StudentPermission"),
            F.col("_section_ref_id").alias("SectionPermission"),
            sk_concat_strict("_school", "_course", "_year", "_section",
                             "_session").alias("SectionKeyPermission"),
            F.col("educationOrganizationId").alias("SchoolPermission"),
            F.lit("").alias("DistrictId"),
        )
        result = district_school.unionByName(section_rows)
    else:
        result = district_school

    return CONTRACT.conform(result.dropDuplicates(), spark)
