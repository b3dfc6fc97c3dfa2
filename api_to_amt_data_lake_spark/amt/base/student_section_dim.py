"""student_section_dim — student section enrollments enriched with course,
subject, and aggregated teacher names.

Parity target: `parquet/amt/base/student_section_dim/main.py`
(RESULT_COLUMNS `main.py:31-43`). The teacher-name aggregation (A8,
`main.py:270-276`) is an unordered ', '.join in the reference; here the
names sort alphabetically inside the group (deterministic under shuffles —
documented deviation per SURVEY.md §2.4 A8).

Join chain: ssa → sections (href id) → [teacher names per section] →
courseOfferings → courses → academicSubjectDescriptors (inner, like the
reference — a course with an unknown subject drops out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.descriptors import (
    descriptor_code_value,
    ref_from_href,
)
from api_to_amt_data_lake_spark.functions.keys import sk_concat_strict
from api_to_amt_data_lake_spark.functions.nulls import null_to_empty
from api_to_amt_data_lake_spark.operators.aggregates import string_agg_ordered
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import read_collection

CONTRACT = ViewContract(
    name="studentSectionDim",
    columns=(
        "StudentSectionKey", "StudentSchoolKey", "StudentKey", "SectionKey",
        "LocalCourseCode", "Subject", "CourseTitle", "TeacherName",
        "StudentSectionStartDateKey", "StudentSectionEndDateKey",
        "SchoolKey", "SchoolYear",
    ),
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    ssa = read_collection(spark, silver_root, school_year,
                          "studentSectionAssociations")
    sections = read_collection(spark, silver_root, school_year, "sections")
    offerings = read_collection(spark, silver_root, school_year, "courseOfferings")
    courses = read_collection(spark, silver_root, school_year, "courses")
    staffs = read_collection(spark, silver_root, school_year, "staffs")
    staff_assoc = read_collection(spark, silver_root, school_year,
                                  "staffSectionAssociations")
    subjects = read_collection(spark, silver_root, school_year,
                               "academicSubjectDescriptors")
    if ssa is None or sections is None or offerings is None or courses is None \
            or subjects is None or staff_assoc is None:
        return CONTRACT.empty(spark)

    enroll = ssa.select(
        F.col("studentReference.studentUniqueId").cast("string").alias("StudentKey"),
        ref_from_href(F.col("sectionReference.link.href")).alias("_sec_ref"),
        F.col("sectionReference.schoolId").cast("string").alias("SchoolKey"),
        F.col("sectionReference.localCourseCode").alias("LocalCourseCode"),
        F.col("sectionReference.schoolYear").cast("string").alias("SchoolYear"),
        F.col("sectionReference.sectionIdentifier").alias("SectionIdentifier"),
        F.col("sectionReference.sessionName").alias("SessionName"),
        date_key("beginDate").alias("StudentSectionStartDateKey"),
        (date_key("endDate") if "endDate" in ssa.columns
         else F.lit(None).cast("string")).alias("StudentSectionEndDateKey"),
    )
    sec = sections.select(
        F.col("id").alias("_sec_id"),
        ref_from_href(F.col("courseOfferingReference.link.href")).alias("_co_ref"),
    )
    # Teacher names per section: staff inner-join assoc, then ordered
    # string-agg — one shuffle keyed by section id.
    staff_names = None
    if staffs is not None:
        assoc = staff_assoc.select(
            ref_from_href(F.col("staffReference.link.href")).alias("_staff_ref"),
            ref_from_href(F.col("sectionReference.link.href")).alias("_sec_ref2"),
        )
        names = staffs.select(
            F.col("id").alias("_staff_id"),
            F.concat(F.col("firstName"), F.lit(" "), F.col("lastSurname"))
            .alias("_teacher"),
        )
        staff_names = string_agg_ordered(
            names.join(assoc, names._staff_id == assoc._staff_ref, "inner"),
            ["_sec_ref2"], "_teacher", order_by=["_teacher"], sep=", ",
            out_name="TeacherName",
        )
    off = offerings.select(
        F.col("id").alias("_off_id"),
        ref_from_href(F.col("courseReference.link.href")).alias("_course_ref"),
    )
    crs = courses.select(
        F.col("id").alias("_crs_id"),
        F.col("courseTitle").alias("CourseTitle"),
        descriptor_code_value(
            F.col("academicSubjectDescriptor")
            if "academicSubjectDescriptor" in courses.columns
            else F.lit(None).cast("string")
        ).alias("_subj_cv"),
    )
    subj = subjects.select(
        F.col("codeValue").alias("_subj_cv_r"),
        F.col("description").alias("Subject"),
    )

    result = enroll.join(sec, enroll._sec_ref == sec._sec_id, "inner")
    if staff_names is not None:
        result = result.join(
            staff_names, result._sec_ref == staff_names._sec_ref2, "left")
    else:
        result = result.withColumn("TeacherName", F.lit(None).cast("string"))
    result = (
        result.join(off, F.col("_co_ref") == off._off_id, "inner")
        .join(crs, F.col("_course_ref") == crs._crs_id, "inner")
        .join(F.broadcast(subj), F.col("_subj_cv") == subj._subj_cv_r, "inner")
    )
    return CONTRACT.conform(
        result.select(
            sk_concat_strict(
                "StudentKey", "SchoolKey", "LocalCourseCode", "SchoolYear",
                "SectionIdentifier", "SessionName", "StudentSectionStartDateKey",
            ).alias("StudentSectionKey"),
            sk_concat_strict("StudentKey", "SchoolKey").alias("StudentSchoolKey"),
            "StudentKey",
            sk_concat_strict("SchoolKey", "LocalCourseCode", "SchoolYear",
                             "SectionIdentifier", "SessionName").alias("SectionKey"),
            "LocalCourseCode", "Subject", "CourseTitle",
            null_to_empty("TeacherName").alias("TeacherName"),
            "StudentSectionStartDateKey", "StudentSectionEndDateKey",
            "SchoolKey", "SchoolYear",
        ),
        spark,
    )
