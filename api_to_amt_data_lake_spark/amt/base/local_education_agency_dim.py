"""local_education_agency_dim — LEAs joined to SEA + ESC by href ref id.

Parity target: `parquet/amt/base/local_education_agency_dim/main.py`
(RESULT_COLUMNS `main.py:26-37`). Exercises F1 (descriptor code), F3
(href → reference id join keys), two left joins against small dims
(broadcast), ''-defaulting null semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.descriptors import (
    descriptor_code_value,
    ref_from_href,
)
from api_to_amt_data_lake_spark.functions.nulls import null_to_empty
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import read_collection

CONTRACT = ViewContract(
    name="localEducationAgencyDim",
    columns=(
        "LocalEducationAgencyKey", "LocalEducationAgencyName",
        "LocalEducationAgencyType",
        "LocalEducationAgencyParentLocalEducationAgencyKey",
        "LocalEducationAgencyStateEducationAgencyName",
        "LocalEducationAgencyStateEducationAgencyKey",
        "LocalEducationAgencyServiceCenterName",
        "LocalEducationAgencyServiceCenterKey",
        "LocalEducationAgencyCharterStatus",
    ),
)


def _opt(df: DataFrame, path: str, out: str, cast: str = "string") -> F.Column:
    """Nested field or typed-null when the struct is absent from the data."""
    root = path.split(".")[0]
    if root in df.columns:
        return F.col(path).cast(cast).alias(out)
    return F.lit(None).cast(cast).alias(out)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    leas = read_collection(spark, silver_root, school_year, "localEducationAgencies")
    seas = read_collection(spark, silver_root, school_year, "stateEducationAgencies")
    escs = read_collection(spark, silver_root, school_year, "educationServiceCenters")
    if leas is None:
        return CONTRACT.empty(spark)

    lea = leas.select(
        F.col("localEducationAgencyId").cast("string")
        .alias("LocalEducationAgencyKey"),
        F.col("nameOfInstitution").alias("LocalEducationAgencyName"),
        descriptor_code_value(
            F.col("localEducationAgencyCategoryDescriptor")
            if "localEducationAgencyCategoryDescriptor" in leas.columns
            else F.lit(None).cast("string")
        ).alias("LocalEducationAgencyType"),
        _opt(leas, "parentLocalEducationAgencyReference.localEducationAgencyId",
             "parentKey"),
        descriptor_code_value(
            F.coalesce(
                F.col("charterStatusDescriptor")
                if "charterStatusDescriptor" in leas.columns
                else F.lit(None).cast("string"),
                F.lit(""),
            )
        ).alias("LocalEducationAgencyCharterStatus"),
        ref_from_href(
            F.col("educationServiceCenterReference.link.href")
            if "educationServiceCenterReference" in leas.columns
            else F.lit(None).cast("string")
        ).alias("escRefId"),
        ref_from_href(
            F.col("stateEducationAgencyReference.link.href")
            if "stateEducationAgencyReference" in leas.columns
            else F.lit(None).cast("string")
        ).alias("seaRefId"),
    )

    if seas is not None:
        sea = seas.select(
            F.col("id").alias("seaRefId_r"),
            F.col("nameOfInstitution")
            .alias("LocalEducationAgencyStateEducationAgencyName"),
            F.col("stateEducationAgencyId").cast("string")
            .alias("LocalEducationAgencyStateEducationAgencyKey"),
        )
        lea = lea.join(F.broadcast(sea), lea.seaRefId == sea.seaRefId_r, "left")
    else:
        lea = lea.withColumns({
            "LocalEducationAgencyStateEducationAgencyName": F.lit(None).cast("string"),
            "LocalEducationAgencyStateEducationAgencyKey": F.lit(None).cast("string"),
        })

    if escs is not None:
        esc = escs.select(
            F.col("id").alias("escRefId_r"),
            F.col("nameOfInstitution").alias("LocalEducationAgencyServiceCenterName"),
            F.col("educationServiceCenterId").cast("string")
            .alias("LocalEducationAgencyServiceCenterKey"),
        )
        lea = lea.join(F.broadcast(esc), lea.escRefId == esc.escRefId_r, "left")
    else:
        lea = lea.withColumns({
            "LocalEducationAgencyServiceCenterName": F.lit(None).cast("string"),
            "LocalEducationAgencyServiceCenterKey": F.lit(None).cast("string"),
        })

    return CONTRACT.conform(
        lea.select(
            "LocalEducationAgencyKey", "LocalEducationAgencyName",
            "LocalEducationAgencyType",
            null_to_empty("parentKey")
            .alias("LocalEducationAgencyParentLocalEducationAgencyKey"),
            null_to_empty("LocalEducationAgencyStateEducationAgencyName")
            .alias("LocalEducationAgencyStateEducationAgencyName"),
            null_to_empty("LocalEducationAgencyStateEducationAgencyKey")
            .alias("LocalEducationAgencyStateEducationAgencyKey"),
            null_to_empty("LocalEducationAgencyServiceCenterName")
            .alias("LocalEducationAgencyServiceCenterName"),
            null_to_empty("LocalEducationAgencyServiceCenterKey")
            .alias("LocalEducationAgencyServiceCenterKey"),
            "LocalEducationAgencyCharterStatus",
        ),
        spark,
    )
