"""demographics_dim — union of all demographic descriptor values, plus the
CohortYear cross product with school years.

Parity target: `parquet/amt/base/demographics_dim/main.py` (RESULT_COLUMNS
`main.py:31-36`). The reference's fakeKey=-1 full-outer merge
(`main.py:68,90,100-108`) is a disguised cross join (J4): every cohort
year type descriptor × every school year. The seven plain descriptor
families each contribute `{Parent}:{codeValue}` rows via UNION ALL (O3).

All inputs are descriptor tables (tiny at any scale) — the whole view is
a union of broadcast-sized frames; the cross join is 4 × n_years rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import read_collection

CONTRACT = ViewContract(
    name="demographicDim",
    columns=("DemographicKey", "DemographicParentKey", "DemographicLabel",
             "ShortDescription"),
)

_FAMILIES = (
    ("disabilityDescriptors", "Disability"),
    ("disabilityDesignationDescriptors", "DisabilityDesignation"),
    ("languageDescriptors", "Language"),
    ("languageUseDescriptors", "LanguageUse"),
    ("raceDescriptors", "Race"),
    ("tribalAffiliationDescriptors", "TribalAffiliation"),
    ("studentCharacteristicDescriptors", "StudentCharacteristic"),
)


def _family(df: DataFrame, parent: str) -> DataFrame:
    label = F.col("codeValue")
    return df.select(
        F.concat(F.lit(parent), F.lit(":"), label).alias("DemographicKey"),
        F.lit(parent).alias("DemographicParentKey"),
        label.alias("DemographicLabel"),
        F.col("shortDescription").alias("ShortDescription"),
    )


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    parts: list[DataFrame] = []

    years = read_collection(spark, silver_root, school_year, "schoolYearTypes")
    cohort = read_collection(spark, silver_root, school_year,
                             "cohortYearTypeDescriptors")
    if years is not None and cohort is not None:
        y = years.select(F.col("schoolYear").cast("string").alias("_year"))
        c = cohort.select(F.col("codeValue").alias("_code"),
                          F.col("shortDescription").alias("ShortDescription"))
        label = F.concat(F.col("_year"), F.lit("-"), F.col("_code"))
        parts.append(
            c.crossJoin(F.broadcast(y)).select(
                F.concat(F.lit("CohortYear:"), label).alias("DemographicKey"),
                F.lit("CohortYear").alias("DemographicParentKey"),
                label.alias("DemographicLabel"),
                "ShortDescription",
            )
        )

    for endpoint, parent in _FAMILIES:
        df = read_collection(spark, silver_root, school_year, endpoint)
        if df is not None:
            parts.append(_family(df, parent))

    if not parts:
        return CONTRACT.empty(spark)
    return CONTRACT.conform(
        reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), parts),
        spark,
    )
