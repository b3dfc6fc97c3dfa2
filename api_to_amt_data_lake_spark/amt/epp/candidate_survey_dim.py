"""candidate_survey_dim — candidate survey question responses.

Parity target: `parquet/amt/epp/candidate_survey_dim/main.py`. All-inner
chain (`main.py:218-300,330-344`):
surveyQuestionResponses exploded on `surveyQuestionMatrixElementResponses`
(`main.py:155-180`) ⋈ its own header (question/response hrefs,
`main.py:183-215`) ⋈ surveys on surveyIdentifier ⋈ surveyResponses on the
response resource id ⋈ surveyQuestions on (question resource id,
questionCode) ⋈ surveyResponsePersonTargetAssociations on the response
resource id ⋈ candidates on the person resource id.

CandidateSurveyKey = surveyIdentifier-questionCode-surveyResponseIdentifier
-personId (`main.py:352-358`).

Scale: surveys/questions/candidates are dim-sized (broadcast); the
response-side tables are the facts and co-shuffle on response ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.descriptors import ref_from_href
from api_to_amt_data_lake_spark.functions.nulls import null_to_empty
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    array_col,
    col_or_null,
    read_collection,
)

CONTRACT = ViewContract(
    name="epp_CandidateSurveyDim",
    columns=("CandidateSurveyKey", "CandidateKey", "SurveyTitle",
             "SurveySectionTitle", "ResponseDateKey", "QuestionCode",
             "QuestionText", "NumericResponse", "TextResponse"),
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    candidates = read_collection(spark, silver_root, school_year, "candidates")
    surveys = read_collection(spark, silver_root, school_year, "surveys")
    questions = read_collection(spark, silver_root, school_year,
                                "surveyQuestions")
    responses = read_collection(spark, silver_root, school_year,
                                "surveyResponses")
    q_responses = read_collection(spark, silver_root, school_year,
                                  "surveyQuestionResponses")
    person_targets = read_collection(
        spark, silver_root, school_year,
        "surveyResponsePersonTargetAssociations")
    if any(x is None for x in (candidates, surveys, questions, responses,
                               q_responses, person_targets)):
        return CONTRACT.empty(spark)

    svy = F.broadcast(surveys.select(
        F.col("surveyIdentifier").cast("string").alias("_survey_id"),
        F.col("surveyTitle").alias("SurveyTitle"),
    ))
    qst = F.broadcast(questions.select(
        F.col("id").alias("_question_ref_id"),
        col_or_null(questions, "surveySectionReference.surveySectionTitle")
        .alias("SurveySectionTitle"),
        F.col("questionCode").cast("string").alias("QuestionCode"),
        col_or_null(questions, "questionText").alias("QuestionText"),
    ))
    rsp = responses.select(
        F.col("id").alias("_response_ref_id"),
        date_key(col_or_null(responses, "responseDate"))
        .alias("ResponseDateKey"),
        F.col("surveyResponseIdentifier").cast("string")
        .alias("_response_identifier"),
    )
    qr = q_responses.select(
        ref_from_href(col_or_null(q_responses,
                                  "surveyQuestionReference.link.href"))
        .alias("_question_ref_id"),
        ref_from_href(col_or_null(q_responses,
                                  "surveyResponseReference.link.href"))
        .alias("_response_ref_id"),
        F.col("surveyQuestionReference.questionCode").cast("string")
        .alias("QuestionCode"),
        F.col("surveyQuestionReference.surveyIdentifier").cast("string")
        .alias("_survey_id"),
        F.explode(array_col(
            q_responses, "surveyQuestionMatrixElementResponses",
            "struct<numericResponse:bigint,textResponse:string>"))
        .alias("_v"),
    ).select(
        "_question_ref_id", "_response_ref_id", "QuestionCode", "_survey_id",
        F.col("_v.numericResponse").cast("string").alias("NumericResponse"),
        F.col("_v.textResponse").alias("TextResponse"),
    )
    targets = person_targets.select(
        ref_from_href(col_or_null(person_targets,
                                  "surveyResponseReference.link.href"))
        .alias("_response_ref_id"),
        F.col("personReference.personId").cast("string").alias("_person_id"),
        ref_from_href(col_or_null(person_targets, "personReference.link.href"))
        .alias("_person_ref_id"),
    )
    cand = F.broadcast(candidates.select(
        F.col("candidateIdentifier").cast("string").alias("CandidateKey"),
        ref_from_href(col_or_null(candidates, "personReference.link.href"))
        .alias("_person_ref_id"),
    ))

    result = (
        qr.join(svy, "_survey_id", "inner")
        .join(rsp, "_response_ref_id", "inner")
        .join(qst, ["_question_ref_id", "QuestionCode"], "inner")
        .join(targets, "_response_ref_id", "inner")
        .join(cand, "_person_ref_id", "inner")
    )
    return CONTRACT.conform(
        result.select(
            F.concat_ws("-", "_survey_id", "QuestionCode",
                        "_response_identifier", "_person_id")
            .alias("CandidateSurveyKey"),
            "CandidateKey", "SurveyTitle", "SurveySectionTitle",
            "ResponseDateKey", "QuestionCode", "QuestionText",
            null_to_empty("NumericResponse").alias("NumericResponse"),
            null_to_empty("TextResponse").alias("TextResponse"),
        ),
        spark,
    )
