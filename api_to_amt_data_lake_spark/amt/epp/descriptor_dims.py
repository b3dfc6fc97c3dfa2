"""epp descriptor dims — (DescriptorKey, CodeValue) projections.

Parity targets: `parquet/amt/epp/race_descriptor_dim/main.py`,
`sex_descriptor_dim/main.py`, `term_descriptor_dim/main.py` — identical
shape: read one descriptor collection, project id (as string) + codeValue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import read_collection


def _descriptor_dim(view_name: str, endpoint: str, id_field: str,
                    key_name: str):
    contract = ViewContract(name=view_name, columns=(key_name, "CodeValue"))

    def build(spark: SparkSession, silver_root: str, school_year: str | int,
              run_date: str | None = None) -> DataFrame:
        src = read_collection(spark, silver_root, school_year, endpoint)
        if src is None:
            return contract.empty(spark)
        return contract.conform(
            src.select(
                F.col(id_field).cast("string").alias(key_name),
                F.col("codeValue").alias("CodeValue"),
            ),
            spark,
        )

    return contract, build


class race_descriptor_dim:
    CONTRACT, build = _descriptor_dim(
        "epp_RaceDescriptorDim", "raceDescriptors", "raceDescriptorId",
        "RaceDescriptorKey")
    build = staticmethod(build)


class sex_descriptor_dim:
    CONTRACT, build = _descriptor_dim(
        "epp_SexDescriptorDim", "sexDescriptors", "sexDescriptorId",
        "SexDescriptorKey")
    build = staticmethod(build)


class term_descriptor_dim:
    CONTRACT, build = _descriptor_dim(
        "epp_TermDescriptorDim", "termDescriptors", "termDescriptorId",
        "TermDescriptorKey")
    build = staticmethod(build)
