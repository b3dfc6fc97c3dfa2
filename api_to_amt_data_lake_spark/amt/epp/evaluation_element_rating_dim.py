"""evaluation_element_rating_dim — candidate evaluation element ratings.

Parity target: `parquet/amt/epp/evaluation_element_rating_dim/main.py`.
evaluationElementRatings (one row per rating doc, `main.py:52-69`)
left-exploded on `results` (`main.py:74-87`), inner-joined to candidates on
person id (`main.py:146-155`), constrained to titles present in
evaluationObjectives (`main.py:157-166` — an inner title join whose
fan-out the trailing drop_duplicates collapses; expressed here as
LEFT SEMI, same surviving rows, no fan-out), left-joined to
termDescriptors on `namespace#codeValue` (`main.py:131-134,168-177`),
deduped on the output grain (`main.py:178-185`, A12).

Type notes: the reference's `astype(str)` renders a missed term-descriptor
join as the string 'nan' (`main.py:203-204`); we keep SQL null instead.
EvaluationDate is the raw string truncated to 10 chars (`main.py:186-188`).

Scale: candidates/objectives/termDescriptors are dim-sized → broadcast;
the ratings scan never shuffles before its dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    array_col,
    col_or_null,
    read_collection,
)

CONTRACT = ViewContract(
    name="epp_EvaluationElementRatingDim",
    columns=("CandidateKey", "EvaluationDate", "EvaluationDateKey",
             "PerformanceEvaluationTitle", "EvaluationObjectiveTitle",
             "EvaluationElementTitle", "RatingResultTitle", "EvaluationTitle",
             "TermDescriptorId", "TermDescriptorKey", "SchoolYear", "Rating"),
    types={"Rating": "double"},
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    ratings = read_collection(spark, silver_root, school_year,
                              "evaluationElementRatings")
    candidates = read_collection(spark, silver_root, school_year, "candidates")
    objectives = read_collection(spark, silver_root, school_year,
                                 "evaluationObjectives")
    terms = read_collection(spark, silver_root, school_year,
                            "termDescriptors")
    if ratings is None or candidates is None or objectives is None:
        return CONTRACT.empty(spark)

    base = ratings.select(
        F.col("evaluationObjectiveRatingReference.personId").cast("string")
        .alias("_person_id"),
        F.col("evaluationObjectiveRatingReference.evaluationDate")
        .cast("string").substr(1, 10).alias("EvaluationDate"),
        F.col("evaluationObjectiveRatingReference.evaluationObjectiveTitle")
        .alias("EvaluationObjectiveTitle"),
        F.col("evaluationElementReference.performanceEvaluationTitle")
        .alias("PerformanceEvaluationTitle"),
        F.col("evaluationElementReference.evaluationElementTitle")
        .alias("EvaluationElementTitle"),
        col_or_null(ratings, "evaluationElementReference.termDescriptor")
        .alias("_term_uri"),
        F.col("evaluationElementReference.schoolYear").cast("string")
        .alias("SchoolYear"),
        F.col("evaluationElementReference.evaluationTitle")
        .alias("EvaluationTitle"),
        F.explode_outer(array_col(
            ratings, "results",
            "struct<ratingResultTitle:string,rating:double>")).alias("_r"),
    ).select(
        "*",
        F.col("_r.ratingResultTitle").alias("RatingResultTitle"),
        F.col("_r.rating").cast("double").alias("Rating"),
    ).drop("_r")

    cand = F.broadcast(candidates.select(
        F.col("personReference.personId").cast("string").alias("_person_id"),
        F.col("candidateIdentifier").cast("string").alias("CandidateKey"),
    ))
    obj_titles = F.broadcast(objectives.select(
        F.col("evaluationObjectiveTitle").alias("EvaluationObjectiveTitle")))

    result = (
        base.join(cand, "_person_id", "inner")
        .join(obj_titles, "EvaluationObjectiveTitle", "left_semi")
    )
    if terms is not None:
        term_map = F.broadcast(terms.select(
            F.concat_ws("#", "namespace", "codeValue").alias("_term_uri"),
            F.col("termDescriptorId").cast("string").alias("TermDescriptorId"),
        ))
        result = result.join(term_map, "_term_uri", "left")
    else:
        result = result.withColumn("TermDescriptorId",
                                   F.lit(None).cast("string"))

    return CONTRACT.conform(
        result.select(
            "CandidateKey", "EvaluationDate",
            date_key("EvaluationDate").alias("EvaluationDateKey"),
            "PerformanceEvaluationTitle", "EvaluationObjectiveTitle",
            "EvaluationElementTitle", "RatingResultTitle", "EvaluationTitle",
            "TermDescriptorId",
            F.col("TermDescriptorId").alias("TermDescriptorKey"),
            "SchoolYear", "Rating",
        ).dropDuplicates([
            "CandidateKey", "EvaluationDate", "PerformanceEvaluationTitle",
            "EvaluationObjectiveTitle", "EvaluationElementTitle",
            "RatingResultTitle", "EvaluationTitle", "TermDescriptorId",
            "SchoolYear", "Rating",
        ]),
        spark,
    )
