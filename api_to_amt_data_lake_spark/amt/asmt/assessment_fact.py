"""assessment_fact — assessment metadata exploded over grade levels,
scores, subjects, objective assessments, and learning standards.

Parity target: `parquet/amt/asmt/assessment_fact/main.py`. Assessment side
(`main.py:181-312`): base record ⟕ assessedGradeLevels ⟕ scores ⟕
academicSubjects, each exploded and left-joined back on
(assessmentIdentifier, namespace) — the reference's deliberate cross
product of the three lists. Objective side (`main.py:317-433`):
objectiveAssessments ⟕ their scores ⟕ learningStandards on
(assessment id, namespace, identificationCode). Final left join of the
two sides (`main.py:414-425`), descriptor-description lookups
(`main.py:77-180,437-446`), ''-fill, and the 9-part AssessmentFactKey
(`main.py:463-473`). '--' objective/parent keys blank out
(`main.py:494-496`).

Type note: the reference's `astype(str)` of float-widened descriptor ids
produces '31.0'-style key parts; we keep clean integer strings.

Scale: every descriptor table is broadcast; both sides shuffle once on
(assessmentIdentifier, namespace) — co-partitioned through the chain of
left joins, which AQE executes as a single exchange per side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    name="asmt_AssessmentFact",
    columns=("AssessmentFactKey", "AssessmentKey", "AssessmentIdentifier",
             "Namespace", "Title", "Version", "Category", "AssessedGradeLevel",
             "AcademicSubject", "ResultDataType", "ReportingMethod",
             "ObjectiveAssessmentKey", "IdentificationCode",
             "ParentObjectiveAssessmentKey", "ObjectiveAssessmentDescription",
             "PercentOfAssessment", "MinScore", "MaxScore", "LearningStandard"),
)


def _desc_map(df: DataFrame, id_field: str, id_alias: str, desc_alias: str,
              code_alias: str):
    return F.broadcast(df.select(
        F.col("codeValue").alias(code_alias),
        F.col(id_field).cast("string").alias(id_alias),
        col_or_null(df, "description").alias(desc_alias),
    ))


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    asm = read_collection(spark, silver_root, school_year, "assessments")
    if asm is None:
        return CONTRACT.empty(spark)
    objectives = read_collection(spark, silver_root, school_year,
                                 "objectiveAssessments")
    cats = read_collection(spark, silver_root, school_year,
                           "assessmentCategoryDescriptors")
    grades = read_collection(spark, silver_root, school_year,
                             "gradeLevelDescriptors")
    methods = read_collection(spark, silver_root, school_year,
                              "assessmentReportingMethodDescriptors")
    subjects = read_collection(spark, silver_root, school_year,
                               "academicSubjectDescriptors")
    datatypes = read_collection(spark, silver_root, school_year,
                                "resultDatatypeTypeDescriptors")

    key = ["AssessmentIdentifier", "Namespace"]
    base = asm.select(
        F.col("assessmentIdentifier").cast("string")
        .alias("AssessmentIdentifier"),
        F.col("namespace").alias("Namespace"),
        descriptor_code_value(col_or_null(asm, "assessmentCategoryDescriptor"))
        .alias("_cat_code"),
        col_or_null(asm, "assessmentTitle").alias("Title"),
        col_or_null(asm, "assessmentVersion").cast("string").alias("Version"),
    )

    gl = asm.select(
        F.col("assessmentIdentifier").cast("string")
        .alias("AssessmentIdentifier"),
        F.col("namespace").alias("Namespace"),
        F.explode(array_col(asm, "assessedGradeLevels",
                            "struct<gradeLevelDescriptor:string>"))
        .alias("_g"),
    ).select(*key, descriptor_code_value(F.col("_g.gradeLevelDescriptor"))
             .alias("_gl_code"))
    if grades is not None:
        gl = gl.join(_desc_map(grades, "gradeLevelDescriptorId", "_gl_id",
                               "AssessedGradeLevel", "_gl_code"),
                     "_gl_code", "left")
    else:
        gl = gl.withColumn("_gl_id", F.lit(None).cast("string")) \
               .withColumn("AssessedGradeLevel", F.lit(None).cast("string"))

    sc = asm.select(
        F.col("assessmentIdentifier").cast("string")
        .alias("AssessmentIdentifier"),
        F.col("namespace").alias("Namespace"),
        F.explode(array_col(
            asm, "scores",
            "struct<assessmentReportingMethodDescriptor:string,"
            "maximumScore:string,minimumScore:string,"
            "resultDatatypeTypeDescriptor:string>")).alias("_s"),
    ).select(
        *key,
        descriptor_code_value(
            F.col("_s.assessmentReportingMethodDescriptor"))
        .alias("_arm_code"),
        F.col("_s.maximumScore").cast("string").alias("_max"),
        F.col("_s.minimumScore").cast("string").alias("_min"),
        descriptor_code_value(F.col("_s.resultDatatypeTypeDescriptor"))
        .alias("_rdt_code"),
    )
    if datatypes is not None:
        sc = sc.join(_desc_map(datatypes, "resultDatatypeTypeDescriptorId",
                               "_rdt_id", "_rdt_desc", "_rdt_code"),
                     "_rdt_code", "left")
    else:
        sc = sc.withColumn("_rdt_desc", F.lit(None).cast("string"))
    if methods is not None:
        sc = sc.join(_desc_map(methods,
                               "assessmentReportingMethodDescriptorId",
                               "_arm_id", "_arm_desc", "_arm_code"),
                     "_arm_code", "left")
    else:
        sc = sc.withColumn("_arm_id", F.lit(None).cast("string")) \
               .withColumn("_arm_desc", F.lit(None).cast("string"))

    subj = asm.select(
        F.col("assessmentIdentifier").cast("string")
        .alias("AssessmentIdentifier"),
        F.col("namespace").alias("Namespace"),
        F.explode(array_col(asm, "academicSubjects",
                            "struct<academicSubjectDescriptor:string>"))
        .alias("_a"),
    ).select(*key,
             descriptor_code_value(F.col("_a.academicSubjectDescriptor"))
             .alias("_subj_code"))
    if subjects is not None:
        subj = subj.join(_desc_map(subjects, "academicSubjectDescriptorId",
                                   "_subj_id", "AcademicSubject",
                                   "_subj_code"),
                         "_subj_code", "left")
    else:
        subj = subj.withColumn("_subj_id", F.lit(None).cast("string")) \
                   .withColumn("AcademicSubject", F.lit(None).cast("string"))

    result = base.join(gl, key, "left").join(sc, key, "left") \
                 .join(subj, key, "left")

    # Objective side (`main.py:317-433`)
    if objectives is not None:
        okey = ["AssessmentIdentifier", "Namespace", "IdentificationCode"]
        obase = objectives.select(
            F.col("assessmentReference.assessmentIdentifier").cast("string")
            .alias("AssessmentIdentifier"),
            F.col("assessmentReference.namespace").alias("Namespace"),
            F.col("identificationCode").cast("string")
            .alias("IdentificationCode"),
            col_or_null(
                objectives,
                "parentObjectiveAssessmentReference.assessmentIdentifier")
            .alias("_parent_id"),
            col_or_null(
                objectives,
                "parentObjectiveAssessmentReference.identificationCode")
            .alias("_parent_code"),
            col_or_null(objectives,
                        "parentObjectiveAssessmentReference.namespace")
            .alias("_parent_ns"),
            col_or_null(objectives, "description")
            .alias("ObjectiveAssessmentDescription"),
            col_or_null(objectives, "percentOfAssessment", "string")
            .alias("PercentOfAssessment"),
        )
        oscores = objectives.select(
            F.col("assessmentReference.assessmentIdentifier").cast("string")
            .alias("AssessmentIdentifier"),
            F.col("assessmentReference.namespace").alias("Namespace"),
            F.col("identificationCode").cast("string")
            .alias("IdentificationCode"),
            F.explode(array_col(
                objectives, "scores",
                "struct<assessmentReportingMethodDescriptor:string,"
                "maximumScore:string,minimumScore:string,"
                "resultDatatypeTypeDescriptor:string>")).alias("_s"),
        ).select(
            *okey,
            descriptor_code_value(
                F.col("_s.assessmentReportingMethodDescriptor"))
            .alias("_oarm_code"),
            F.col("_s.maximumScore").cast("string").alias("_omax"),
            F.col("_s.minimumScore").cast("string").alias("_omin"),
            descriptor_code_value(F.col("_s.resultDatatypeTypeDescriptor"))
            .alias("_ordt_code"),
        )
        if datatypes is not None:
            oscores = oscores.join(
                _desc_map(datatypes, "resultDatatypeTypeDescriptorId",
                          "_ordt_id", "_ordt_desc", "_ordt_code"),
                "_ordt_code", "left")
        else:
            oscores = oscores.withColumn("_ordt_desc",
                                         F.lit(None).cast("string"))
        if methods is not None:
            oscores = oscores.join(
                _desc_map(methods, "assessmentReportingMethodDescriptorId",
                          "_oarm_id", "_oarm_desc", "_oarm_code"),
                "_oarm_code", "left")
        else:
            oscores = oscores.withColumn("_oarm_id",
                                         F.lit(None).cast("string")) \
                             .withColumn("_oarm_desc",
                                         F.lit(None).cast("string"))
        ostandards = objectives.select(
            F.col("assessmentReference.assessmentIdentifier").cast("string")
            .alias("AssessmentIdentifier"),
            F.col("assessmentReference.namespace").alias("Namespace"),
            F.col("identificationCode").cast("string")
            .alias("IdentificationCode"),
            F.explode(array_col(
                objectives, "learningStandards",
                "struct<learningStandardReference:"
                "struct<learningStandardId:string>>")).alias("_l"),
        ).select(*okey,
                 F.col("_l.learningStandardReference.learningStandardId")
                 .cast("string").alias("LearningStandard"))
        oside = obase.join(oscores, okey, "left").join(ostandards, okey, "left")
        result = result.join(oside, key, "left")
    else:
        for c, t in (("IdentificationCode", "string"),
                     ("_parent_id", "string"), ("_parent_code", "string"),
                     ("_parent_ns", "string"),
                     ("ObjectiveAssessmentDescription", "string"),
                     ("PercentOfAssessment", "string"),
                     ("_oarm_id", "string"), ("_oarm_desc", "string"),
                     ("_ordt_desc", "string"), ("_omax", "string"),
                     ("_omin", "string"), ("LearningStandard", "string")):
            result = result.withColumn(c, F.lit(None).cast(t))

    if cats is not None:
        result = result.join(
            _desc_map(cats, "assessmentCategoryDescriptorId", "_cat_id",
                      "Category", "_cat_code"),
            "_cat_code", "left")
    else:
        result = result.withColumn("Category", F.lit(None).cast("string"))

    objective_key = F.concat_ws(
        "-", "AssessmentIdentifier", null_to_empty("IdentificationCode"),
        "Namespace")
    parent_key = F.concat_ws("-", null_to_empty("_parent_id"),
                             null_to_empty("_parent_code"),
                             null_to_empty("_parent_ns"))
    return CONTRACT.conform(
        result.select(
            F.concat_ws(
                "-", "AssessmentIdentifier", "Namespace",
                null_to_empty("_gl_id"), null_to_empty("_arm_id"),
                null_to_empty("_subj_id"), null_to_empty("IdentificationCode"),
                null_to_empty("_parent_code"), null_to_empty("_oarm_id"),
                null_to_empty("LearningStandard"),
            ).alias("AssessmentFactKey"),
            F.concat_ws("-", "AssessmentIdentifier", "Namespace")
            .alias("AssessmentKey"),
            "AssessmentIdentifier", "Namespace",
            null_to_empty("Title").alias("Title"),
            null_to_empty("Version").alias("Version"),
            null_to_empty("Category").alias("Category"),
            null_to_empty("AssessedGradeLevel").alias("AssessedGradeLevel"),
            null_to_empty("AcademicSubject").alias("AcademicSubject"),
            F.coalesce(F.when(F.col("_rdt_desc") != "", F.col("_rdt_desc")),
                       F.col("_ordt_desc"), F.lit(""))
            .alias("ResultDataType"),
            F.coalesce(F.when(F.col("_arm_desc") != "", F.col("_arm_desc")),
                       F.col("_oarm_desc"), F.lit(""))
            .alias("ReportingMethod"),
            F.when(null_to_empty("IdentificationCode") != "", objective_key)
            .otherwise(F.lit("")).alias("ObjectiveAssessmentKey"),
            null_to_empty("IdentificationCode").alias("IdentificationCode"),
            F.when(parent_key == "--", F.lit("")).otherwise(parent_key)
            .alias("ParentObjectiveAssessmentKey"),
            null_to_empty("ObjectiveAssessmentDescription")
            .alias("ObjectiveAssessmentDescription"),
            null_to_empty("PercentOfAssessment").alias("PercentOfAssessment"),
            F.coalesce(F.when(F.col("_min") != "", F.col("_min")),
                       F.col("_omin"), F.lit("")).alias("MinScore"),
            F.coalesce(F.when(F.col("_max") != "", F.col("_max")),
                       F.col("_omax"), F.lit("")).alias("MaxScore"),
            null_to_empty("LearningStandard").alias("LearningStandard"),
        ),
        spark,
    )
