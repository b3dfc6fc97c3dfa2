"""epp_financial_aid_fact — candidate financial aid records.

Parity target: `parquet/amt/epp/epp_financial_aid_fact/main.py`.
candidates (with a person href, `main.py:126-135`) ⋈ students on the
person resource id (`main.py:186-200`), LEFT-joined to financialAids on
the student resource id (`main.py:204-218` — candidates with no aid keep
one empty-aid row), LEFT-joined to aidTypeDescriptors on the parsed code
value (`main.py:222-236`). Pell flag to 0/1 (`main.py:88-89,243-244`),
aid amount defaulting to 0 (`main.py:242`).

Key quirk preserved: CandidateAidKey concatenates with ''-filled parts,
so an aid-less candidate keys as `{candidate}--` (`main.py:246-251`).
BeginDateKey/EndDateKey are the RAW ISO date strings, not yyyymmdd —
the reference assigns `beginDate`/`endDate` to them (`main.py:254-255`),
overriding the computed yyyymmdd key.

Scale: candidates/students/descriptors broadcast; financialAids is the
fact side and joins shuffle-free against broadcast dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.descriptors import (
    descriptor_code_value,
    ref_from_href,
)
from api_to_amt_data_lake_spark.functions.nulls import null_to_empty
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    col_or_null,
    read_collection,
)

CONTRACT = ViewContract(
    name="epp_FinancialAidFact",
    columns=("CandidateAidKey", "CandidateKey", "BeginDate", "EndDate",
             "AidConditionDescription", "AidType", "AidAmount",
             "PellGrantRecipient", "BeginDateKey", "EndDateKey"),
    types={"AidAmount": "double", "PellGrantRecipient": "int"},
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    aids = read_collection(spark, silver_root, school_year, "financialAids")
    candidates = read_collection(spark, silver_root, school_year, "candidates")
    students = read_collection(spark, silver_root, school_year, "students")
    aid_types = read_collection(spark, silver_root, school_year,
                                "aidTypeDescriptors")
    if aids is None or candidates is None or students is None:
        return CONTRACT.empty(spark)

    cand = candidates.select(
        F.col("candidateIdentifier").cast("string").alias("CandidateKey"),
        ref_from_href(col_or_null(candidates, "personReference.link.href"))
        .alias("_person_ref_id"),
    ).filter(F.col("_person_ref_id").isNotNull()
             & (F.col("_person_ref_id") != ""))
    stu = students.select(
        F.col("id").alias("_student_ref_id"),
        ref_from_href(col_or_null(students, "personReference.link.href"))
        .alias("_person_ref_id"),
    ).filter(F.col("_person_ref_id").isNotNull()
             & (F.col("_person_ref_id") != ""))

    fa = aids.select(
        ref_from_href(col_or_null(aids, "studentReference.link.href"))
        .alias("_student_ref_id"),
        col_or_null(aids, "beginDate").alias("BeginDate"),
        col_or_null(aids, "endDate").alias("EndDate"),
        col_or_null(aids, "aidConditionDescription")
        .alias("AidConditionDescription"),
        descriptor_code_value(col_or_null(aids, "aidTypeDescriptor"))
        .alias("AidType"),
        col_or_null(aids, "aidAmount", "double").alias("AidAmount"),
        col_or_null(aids, "pellGrantRecipient", "boolean").alias("_pell"),
        date_key(col_or_null(aids, "beginDate")).alias("_begin_key"),
    )

    result = (
        cand.join(F.broadcast(stu), "_person_ref_id", "inner")
        .join(fa, "_student_ref_id", "left")
    )
    if aid_types is not None:
        type_map = F.broadcast(aid_types.select(
            F.col("codeValue").alias("AidType"),
            F.col("aidTypeDescriptorId").cast("string").alias("_aid_type_id"),
        ))
        result = result.join(type_map, "AidType", "left")
    else:
        result = result.withColumn("_aid_type_id", F.lit(None).cast("string"))

    return CONTRACT.conform(
        result.select(
            F.concat_ws("-", "CandidateKey",
                        null_to_empty("_aid_type_id"),
                        null_to_empty("_begin_key"))
            .alias("CandidateAidKey"),
            "CandidateKey",
            null_to_empty("BeginDate").alias("BeginDate"),
            null_to_empty("EndDate").alias("EndDate"),
            null_to_empty("AidConditionDescription")
            .alias("AidConditionDescription"),
            null_to_empty("AidType").alias("AidType"),
            F.coalesce("AidAmount", F.lit(0.0)).alias("AidAmount"),
            F.coalesce(F.col("_pell").cast("int"), F.lit(0))
            .alias("PellGrantRecipient"),
            null_to_empty("BeginDate").alias("BeginDateKey"),
            null_to_empty("EndDate").alias("EndDateKey"),
        ),
        spark,
    )
