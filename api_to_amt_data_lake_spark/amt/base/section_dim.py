"""section_dim — sections enriched through course offerings, courses,
sessions, schools and three descriptor tables.

Parity target: `parquet/amt/base/section_dim/main.py` (RESULT_COLUMNS
`main.py:28-40`; 7-join chain `main.py:205-280`; fillna('') then
key/description concats `main.py:302-338`). Exercises F3 href-ref joins,
descriptor joins on namespace#codeValue, J1/J2 chains, and the
null→''-then-concat dialect (keys never null, missing parts collapse to
empty string between dashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.descriptors import ref_from_href
from api_to_amt_data_lake_spark.functions.nulls import null_to_empty
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import read_collection

CONTRACT = ViewContract(
    name="sectionDim",
    columns=(
        "SchoolKey", "SectionKey", "Description", "SectionName", "SessionName",
        "LocalCourseCode", "SchoolYear", "EducationalEnvironmentDescriptor",
        "LocalEducationAgencyKey", "CourseTitle", "SessionKey",
    ),
)


def _descriptor_lookup(df: DataFrame | None, out: str) -> DataFrame | None:
    """namespace#codeValue → description (reference builds
    `namespaceWithCodeValue` and left-joins on it)."""
    if df is None:
        return None
    return df.select(
        F.concat(F.col("namespace"), F.lit("#"), F.col("codeValue")).alias("_ns_cv"),
        F.col("description").alias(out),
    )


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    sections = read_collection(spark, silver_root, school_year, "sections")
    offerings = read_collection(spark, silver_root, school_year, "courseOfferings")
    courses = read_collection(spark, silver_root, school_year, "courses")
    sessions = read_collection(spark, silver_root, school_year, "sessions")
    schools = read_collection(spark, silver_root, school_year, "schools")
    subj_desc = _descriptor_lookup(
        read_collection(spark, silver_root, school_year, "academicSubjectDescriptors"),
        "_subj_description")
    term_desc = _descriptor_lookup(
        read_collection(spark, silver_root, school_year, "termDescriptors"),
        "_term_description")
    env_desc = _descriptor_lookup(
        read_collection(spark, silver_root, school_year,
                        "educationalEnvironmentDescriptors"),
        "_env_description")
    if sections is None or offerings is None or courses is None:
        return CONTRACT.empty(spark)

    sec = sections.select(
        F.col("sectionIdentifier").alias("sectionIdentifier"),
        F.col("courseOfferingReference.localCourseCode").alias("LocalCourseCode"),
        F.col("courseOfferingReference.schoolId").cast("string").alias("SchoolKey"),
        F.col("courseOfferingReference.schoolYear").cast("string").alias("SchoolYear"),
        F.col("courseOfferingReference.sessionName").alias("SessionName"),
        ref_from_href(F.col("courseOfferingReference.link.href")).alias("_co_ref"),
        (F.col("educationalEnvironmentDescriptor")
         if "educationalEnvironmentDescriptor" in sections.columns
         else F.lit(None).cast("string")).alias("_env_uri"),
    )
    off = offerings.select(
        F.col("id").alias("_off_id"),
        ref_from_href(F.col("courseReference.link.href")).alias("_course_ref"),
        ref_from_href(F.col("sessionReference.link.href")).alias("_session_ref"),
    )
    crs = courses.select(
        F.col("id").alias("_crs_id"),
        F.col("courseTitle").alias("CourseTitle"),
        (F.col("academicSubjectDescriptor")
         if "academicSubjectDescriptor" in courses.columns
         else F.lit(None).cast("string")).alias("_subj_uri"),
    )
    result = (
        sec.join(off, sec._co_ref == off._off_id, "inner")
        .join(crs, F.col("_course_ref") == crs._crs_id, "inner")
    )
    if sessions is not None:
        ses = sessions.select(
            F.col("id").alias("_ses_id"),
            (F.col("termDescriptor") if "termDescriptor" in sessions.columns
             else F.lit(None).cast("string")).alias("_term_uri"),
        )
        result = result.join(ses, F.col("_session_ref") == ses._ses_id, "left")
    else:
        result = result.withColumn("_term_uri", F.lit(None).cast("string"))
    if schools is not None:
        sch = schools.select(
            F.col("schoolId").cast("string").alias("_sch_id"),
            F.col("localEducationAgencyReference.localEducationAgencyId")
            .cast("string").alias("LocalEducationAgencyKey"),
        )
        result = result.join(
            F.broadcast(sch), F.col("SchoolKey") == sch._sch_id, "left")
    else:
        result = result.withColumn(
            "LocalEducationAgencyKey", F.lit(None).cast("string"))
    if subj_desc is not None:
        result = result.join(
            F.broadcast(subj_desc), F.col("_subj_uri") == subj_desc._ns_cv, "left"
        ).drop("_ns_cv")
    else:
        result = result.withColumn("_subj_description", F.lit(None).cast("string"))
    if term_desc is not None:
        result = result.join(
            F.broadcast(term_desc), F.col("_term_uri") == term_desc._ns_cv, "left"
        ).drop("_ns_cv")
    else:
        result = result.withColumn("_term_description", F.lit(None).cast("string"))
    if env_desc is not None:
        result = result.join(
            F.broadcast(env_desc), F.col("_env_uri") == env_desc._ns_cv, "left"
        ).drop("_ns_cv")
    else:
        result = result.withColumn("_env_description", F.lit(None).cast("string"))

    # fillna('') before concat (reference main.py:302): keys use ''-collapsed
    # parts, so a missing piece leaves consecutive dashes, never a null key.
    e = null_to_empty
    section_key = F.concat_ws("-", e("SchoolKey"), e("LocalCourseCode"),
                              e("SchoolYear"), e("sectionIdentifier"),
                              e("SessionName"))
    description = F.concat(
        e("_subj_description"), F.lit("-("), e("LocalCourseCode"), F.lit(")-"),
        e("CourseTitle"), F.lit("-"), e("_term_description"))
    section_name = F.concat(e("LocalCourseCode"), F.lit("-"), e("SessionName"))
    session_key = F.concat_ws("-", e("SchoolKey"), e("SchoolYear"),
                              e("SessionName"))
    return CONTRACT.conform(
        result.select(
            e("SchoolKey").alias("SchoolKey"),
            section_key.alias("SectionKey"),
            description.alias("Description"),
            section_name.alias("SectionName"),
            e("SessionName").alias("SessionName"),
            e("LocalCourseCode").alias("LocalCourseCode"),
            e("SchoolYear").alias("SchoolYear"),
            e("_env_description").alias("EducationalEnvironmentDescriptor"),
            e("LocalEducationAgencyKey").alias("LocalEducationAgencyKey"),
            e("CourseTitle").alias("CourseTitle"),
            session_key.alias("SessionKey"),
        ),
        spark,
    )
