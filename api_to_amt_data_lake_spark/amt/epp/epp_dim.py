"""epp_dim — education-preparation-provider organizations.

Parity target: `parquet/amt/epp/epp_dim/main.py`: schools whose exploded
educationOrganizationCategories contain a 'Preparation Provider' category
code (P5 contains-filter after F1 parse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.descriptors import descriptor_code_value
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import read_collection

CONTRACT = ViewContract(
    name="epp_EppDim",
    columns=("EducationOrganizationKey", "NameOfInstitution"),
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    schools = read_collection(spark, silver_root, school_year, "schools")
    if schools is None or "educationOrganizationCategories" not in schools.columns:
        return CONTRACT.empty(spark)
    exploded = schools.select(
        F.col("schoolId").cast("string").alias("EducationOrganizationKey"),
        F.col("nameOfInstitution").alias("NameOfInstitution"),
        F.explode_outer(
            "educationOrganizationCategories.educationOrganizationCategoryDescriptor"
        ).alias("_cat"),
    )
    return CONTRACT.conform(
        exploded.filter(
            descriptor_code_value("_cat").contains("Preparation Provider")
        ),
        spark,
    )
