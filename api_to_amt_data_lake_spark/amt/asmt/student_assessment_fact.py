"""student_assessment_fact — student assessment results at score /
performance-level / objective grain.

Parity target: `parquet/amt/asmt/student_assessment_fact/main.py`.
studentAssessments base (`main.py:131-149`) ⟕ scoreResults explode
(`main.py:166-190`) ⟕ performanceLevels explode (`main.py:194-227`) ⟕
studentObjectiveAssessments explode (`main.py:152-164`) ⟕ the objective
assessments' own performanceLevels and scoreResults (two-level record
paths keyed by (doc id, identificationCode), `main.py:230-295`) ⟕
studentSchoolAssociations on the student id (`main.py:369-377`), then the
active-enrollment filter `exitWithdrawDateKey >= today` — a missing exit
date renders 'nan' and passes (`pandasWrapper.py:143-144`), i.e.
`exit IS NULL OR exit >= today`. Rows without an assessment reference are
dropped (`main.py:423`).

Result-column cascade (`main.py:487-494`): Student*/objective columns
prefer the objective-level value and fall back to the assessment-level
one; the StudentAssessment* quartet always carries the assessment-level
value.

Scale: descriptor tables broadcast; the explodes stay in the scan stage;
the single data-scale shuffle is the SSA join on studentUniqueId.
"""

from __future__ import annotations

from datetime import date as _date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.descriptors import (
    descriptor_code_value,
)
from api_to_amt_data_lake_spark.functions.nulls import null_to_empty
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    array_col,
    col_or_null,
    read_collection,
)

CONTRACT = ViewContract(
    name="asmt_StudentAssessmentFact",
    columns=("StudentAssessmentFactKey", "StudentAssessmentKey",
             "StudentObjectiveAssessmentKey", "ObjectiveAssessmentKey",
             "AssessmentKey", "AssessmentIdentifier", "Namespace",
             "StudentAssessmentIdentifier", "StudentKey", "StudentSchoolKey",
             "SchoolKey", "AdministrationDate", "AdministrationDateKey",
             "AssessedGradeLevel", "StudentScore", "ResultDataType",
             "ReportingMethod", "PerformanceResult", "StudentAssessmentScore",
             "StudentAssessmentResultDataType",
             "StudentAssessmentReportingMethod",
             "StudentAssessmentPerformanceResult"),
)

_SCORE_EL = ("struct<assessmentReportingMethodDescriptor:string,"
             "result:string,resultDatatypeTypeDescriptor:string>")
_PERF_EL = ("struct<assessmentReportingMethodDescriptor:string,"
            "performanceLevelDescriptor:string,performanceLevelMet:boolean>")


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    sa = read_collection(spark, silver_root, school_year, "studentAssessments")
    ssa = read_collection(spark, silver_root, school_year,
                          "studentSchoolAssociations")
    methods = read_collection(spark, silver_root, school_year,
                              "assessmentReportingMethodDescriptors")
    levels = read_collection(spark, silver_root, school_year,
                             "performanceLevelDescriptors")
    if sa is None or ssa is None:
        return CONTRACT.empty(spark)

    today_key = (run_date or _date.today().isoformat()).replace("-", "")[:8]

    method_map = None
    if methods is not None:
        method_map = methods.select(
            F.col("codeValue").alias("_code"),
            F.col("assessmentReportingMethodDescriptorId").cast("string")
            .alias("_id"))
    level_map = None
    if levels is not None:
        level_map = levels.select(
            F.col("codeValue").alias("_code"),
            F.col("performanceLevelDescriptorId").cast("string").alias("_id"))

    def attach(df: DataFrame, code_col: str, mapping, id_alias: str):
        if mapping is None:
            return df.withColumn(id_alias, F.lit(None).cast("string"))
        m = F.broadcast(mapping.select(
            F.col("_code").alias(code_col), F.col("_id").alias(id_alias)))
        return df.join(m, code_col, "left")

    base = sa.select(
        F.col("id").alias("_doc_id"),
        col_or_null(sa, "administrationDate").alias("AdministrationDate"),
        F.col("studentAssessmentIdentifier").cast("string")
        .alias("StudentAssessmentIdentifier"),
        F.col("assessmentReference.assessmentIdentifier").cast("string")
        .alias("AssessmentIdentifier"),
        F.col("assessmentReference.namespace").alias("Namespace"),
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("StudentKey"),
        descriptor_code_value(
            col_or_null(sa, "whenAssessedGradeLevelDescriptor"))
        .alias("AssessedGradeLevel"),
    )

    scores = attach(
        sa.select(
            F.col("id").alias("_doc_id"),
            F.explode(array_col(sa, "scoreResults", _SCORE_EL)).alias("_s"),
        ).select(
            "_doc_id",
            descriptor_code_value(
                F.col("_s.assessmentReportingMethodDescriptor"))
            .alias("_sa_arm_code"),
            F.col("_s.result").cast("string").alias("_sa_result"),
            descriptor_code_value(F.col("_s.resultDatatypeTypeDescriptor"))
            .alias("_sa_rdt_code"),
        ), "_sa_arm_code", method_map, "_sa_arm_id")

    perf = attach(attach(
        sa.select(
            F.col("id").alias("_doc_id"),
            F.explode(array_col(sa, "performanceLevels", _PERF_EL))
            .alias("_p"),
        ).select(
            "_doc_id",
            descriptor_code_value(
                F.col("_p.assessmentReportingMethodDescriptor"))
            .alias("_sa_pl_arm_code"),
            descriptor_code_value(F.col("_p.performanceLevelDescriptor"))
            .alias("_sa_pl_code"),
        ), "_sa_pl_arm_code", method_map, "_sa_pl_arm_id"),
        "_sa_pl_code", level_map, "_sa_pl_id")

    soa_el = (f"struct<objectiveAssessmentReference:"
              f"struct<identificationCode:string>,"
              f"scoreResults:array<{_SCORE_EL}>,"
              f"performanceLevels:array<{_PERF_EL}>>")
    soa = sa.select(
        F.col("id").alias("_doc_id"),
        F.explode(array_col(sa, "studentObjectiveAssessments", soa_el))
        .alias("_o"),
    ).select(
        "_doc_id",
        F.col("_o.objectiveAssessmentReference.identificationCode")
        .cast("string").alias("_obj_code"),
    )

    soa_scores = attach(
        sa.select(
            F.col("id").alias("_doc_id"),
            F.explode(array_col(sa, "studentObjectiveAssessments", soa_el))
            .alias("_o"),
        ).select(
            "_doc_id",
            F.col("_o.objectiveAssessmentReference.identificationCode")
            .cast("string").alias("_obj_code"),
            F.explode("_o.scoreResults").alias("_s"),
        ).select(
            "_doc_id", "_obj_code",
            descriptor_code_value(
                F.col("_s.assessmentReportingMethodDescriptor"))
            .alias("_obj_arm_code"),
            F.col("_s.result").cast("string").alias("_obj_result"),
            descriptor_code_value(F.col("_s.resultDatatypeTypeDescriptor"))
            .alias("_obj_rdt_code"),
        ), "_obj_arm_code", method_map, "_obj_arm_id")

    soa_perf = attach(attach(
        sa.select(
            F.col("id").alias("_doc_id"),
            F.explode(array_col(sa, "studentObjectiveAssessments", soa_el))
            .alias("_o"),
        ).select(
            "_doc_id",
            F.col("_o.objectiveAssessmentReference.identificationCode")
            .cast("string").alias("_obj_code"),
            F.explode("_o.performanceLevels").alias("_p"),
        ).select(
            "_doc_id", "_obj_code",
            descriptor_code_value(
                F.col("_p.assessmentReportingMethodDescriptor"))
            .alias("_obj_pl_arm_code"),
            descriptor_code_value(F.col("_p.performanceLevelDescriptor"))
            .alias("_obj_pl_code"),
        ), "_obj_pl_arm_code", method_map, "_obj_pl_arm_id"),
        "_obj_pl_code", level_map, "_obj_pl_id")

    enroll = ssa.select(
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("StudentKey"),
        F.col("schoolReference.schoolId").cast("string").alias("SchoolKey"),
        date_key(col_or_null(ssa, "entryDate")).alias("_entry_key"),
        date_key(col_or_null(ssa, "exitWithdrawDate")).alias("_exit_key"),
    )

    result = (
        base.join(scores, "_doc_id", "left")
        .join(perf, "_doc_id", "left")
        .join(soa, "_doc_id", "left")
        .join(soa_perf, ["_doc_id", "_obj_code"], "left")
        .join(soa_scores, ["_doc_id", "_obj_code"], "left")
        .join(enroll, "StudentKey", "left")
        .filter(F.col("_exit_key").isNull()
                | (F.col("_exit_key") >= today_key))
        .filter(F.col("AssessmentIdentifier").isNotNull()
                & (F.col("AssessmentIdentifier") != ""))
    )

    obj_code = null_to_empty("_obj_code")
    student_obj_key = F.when(
        obj_code != "",
        F.concat_ws("-", "StudentKey", "_obj_code", "AssessmentIdentifier",
                    "StudentAssessmentIdentifier", "Namespace"),
    ).otherwise(F.lit(""))
    obj_key = F.when(
        obj_code != "",
        F.concat_ws("-", "AssessmentIdentifier", "_obj_code", "Namespace"),
    ).otherwise(F.lit(""))

    return CONTRACT.conform(
        result.select(
            F.concat_ws(
                "-", "AssessmentIdentifier", "Namespace",
                "StudentAssessmentIdentifier", null_to_empty("_sa_arm_id"),
                null_to_empty("_sa_pl_id"), obj_code,
                null_to_empty("_obj_arm_id"), null_to_empty("_obj_pl_id"),
                "StudentKey", null_to_empty("SchoolKey"),
                null_to_empty("_entry_key"),
            ).alias("StudentAssessmentFactKey"),
            F.concat_ws("-", "AssessmentIdentifier", "Namespace",
                        "StudentAssessmentIdentifier", "StudentKey")
            .alias("StudentAssessmentKey"),
            student_obj_key.alias("StudentObjectiveAssessmentKey"),
            obj_key.alias("ObjectiveAssessmentKey"),
            F.concat_ws("-", "AssessmentIdentifier", "Namespace")
            .alias("AssessmentKey"),
            "AssessmentIdentifier", "Namespace",
            "StudentAssessmentIdentifier", "StudentKey",
            F.concat_ws("-", "StudentKey", null_to_empty("SchoolKey"))
            .alias("StudentSchoolKey"),
            null_to_empty("SchoolKey").alias("SchoolKey"),
            null_to_empty("AdministrationDate").alias("AdministrationDate"),
            F.coalesce(date_key("AdministrationDate"), F.lit(""))
            .alias("AdministrationDateKey"),
            null_to_empty("AssessedGradeLevel").alias("AssessedGradeLevel"),
            F.coalesce(F.when(F.col("_obj_result") != "",
                              F.col("_obj_result")),
                       F.col("_sa_result"), F.lit("")).alias("StudentScore"),
            F.coalesce(F.when(F.col("_obj_rdt_code") != "",
                              F.col("_obj_rdt_code")),
                       F.col("_sa_rdt_code"), F.lit(""))
            .alias("ResultDataType"),
            F.coalesce(F.when(F.col("_obj_arm_code") != "",
                              F.col("_obj_arm_code")),
                       F.col("_sa_arm_code"), F.lit(""))
            .alias("ReportingMethod"),
            F.coalesce(F.when(F.col("_obj_pl_code") != "",
                              F.col("_obj_pl_code")),
                       F.col("_sa_pl_code"), F.lit(""))
            .alias("PerformanceResult"),
            null_to_empty("_sa_result").alias("StudentAssessmentScore"),
            null_to_empty("_sa_rdt_code")
            .alias("StudentAssessmentResultDataType"),
            null_to_empty("_sa_arm_code")
            .alias("StudentAssessmentReportingMethod"),
            null_to_empty("_sa_pl_code")
            .alias("StudentAssessmentPerformanceResult"),
        ),
        spark,
    )
