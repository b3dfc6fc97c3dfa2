"""school_dim — schools with physical address + LEA/ESC/SEA lineage.

Parity target: `parquet/amt/base/school_dim/main.py` (RESULT_COLUMNS
`main.py:30-44`). Exercises: recordPath explode on addresses (P1), three
left joins (J2), descriptor-constant crosswalk filter (F18 +
`Address.Physical` contains-filter `main.py:160-162`), null-propagating
address concat (pandas `+` — `main.py:169-175`), replace_null to ''
(`main.py:186-201`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.descriptors import descriptor_code_value
from api_to_amt_data_lake_spark.functions.nulls import null_to_empty
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import read_collection
from api_to_amt_data_lake_spark.sources.lookup import with_descriptor_constant

CONTRACT = ViewContract(
    name="schoolDim",
    columns=(
        "SchoolKey", "SchoolName", "SchoolType", "SchoolAddress", "SchoolCity",
        "SchoolCounty", "SchoolState", "LocalEducationAgencyName",
        "LocalEducationAgencyKey", "StateEducationAgencyName",
        "StateEducationAgencyKey", "EducationServiceCenterName",
        "EducationServiceCenterKey",
    ),
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    schools = read_collection(spark, silver_root, school_year, "schools")
    leas = read_collection(spark, silver_root, school_year, "localEducationAgencies")
    seas = read_collection(spark, silver_root, school_year, "stateEducationAgencies")
    escs = read_collection(spark, silver_root, school_year, "educationServiceCenters")
    if schools is None:
        return CONTRACT.empty(spark)

    # recordPath=['addresses'] explode, carrying school meta along.
    exploded = schools.select(
        F.col("schoolId").cast("string").alias("SchoolKey"),
        F.col("nameOfInstitution").alias("SchoolName"),
        F.col("schoolTypeDescriptor").alias("schoolTypeDescriptor"),
        F.col("localEducationAgencyReference.localEducationAgencyId").alias("leaId"),
        F.explode("addresses").alias("addr"),
    ).select(
        "SchoolKey", "SchoolName", "schoolTypeDescriptor", "leaId",
        F.col("addr.addressTypeDescriptor").alias("addressTypeDescriptor"),
        F.col("addr.stateAbbreviationDescriptor").alias("stateAbbreviationDescriptor"),
        F.col("addr.streetNumberName").alias("streetNumberName"),
        F.col("addr.city").alias("city"),
        F.col("addr.nameOfCounty").alias("nameOfCounty"),
    )

    # Crosswalk + keep physical addresses only (contains-match per reference).
    physical = with_descriptor_constant(exploded, "addressTypeDescriptor").filter(
        F.col("addressTypeDescriptor_constantName").contains("Address.Physical")
    )

    if leas is not None:
        lea_cols = leas.select(
            F.col("localEducationAgencyId").alias("leaId_r"),
            F.col("nameOfInstitution").alias("LocalEducationAgencyName"),
            F.col("educationServiceCenterReference.educationServiceCenterId")
            .alias("escRefId")
            if "educationServiceCenterReference" in leas.columns
            else F.lit(None).cast("long").alias("escRefId"),
            F.col("stateEducationAgencyReference.stateEducationAgencyId")
            .alias("seaRefId")
            if "stateEducationAgencyReference" in leas.columns
            else F.lit(None).cast("long").alias("seaRefId"),
        )
        physical = physical.join(
            F.broadcast(lea_cols), physical.leaId == lea_cols.leaId_r, "left"
        )
    else:
        physical = physical.withColumns({
            "leaId_r": F.lit(None).cast("long"),
            "LocalEducationAgencyName": F.lit(None).cast("string"),
            "escRefId": F.lit(None).cast("long"),
            "seaRefId": F.lit(None).cast("long"),
        })

    if escs is not None:
        esc_cols = escs.select(
            F.col("educationServiceCenterId").alias("escId"),
            F.col("nameOfInstitution").alias("EducationServiceCenterName"),
        )
        physical = physical.join(
            F.broadcast(esc_cols), physical.escRefId == esc_cols.escId, "left"
        )
    else:
        physical = physical.withColumns({
            "escId": F.lit(None).cast("long"),
            "EducationServiceCenterName": F.lit(None).cast("string"),
        })

    if seas is not None:
        sea_cols = seas.select(
            F.col("stateEducationAgencyId").alias("seaId"),
            F.col("nameOfInstitution").alias("StateEducationAgencyName"),
        )
        physical = physical.join(
            F.broadcast(sea_cols), physical.seaRefId == sea_cols.seaId, "left"
        )
    else:
        physical = physical.withColumns({
            "seaId": F.lit(None).cast("long"),
            "StateEducationAgencyName": F.lit(None).cast("string"),
        })

    state_code = descriptor_code_value("stateAbbreviationDescriptor")
    # pandas `+` concat: any null component nulls the whole address.
    school_address = F.concat(
        F.col("streetNumberName"), F.lit(", "), F.col("city"), F.lit(" "),
        state_code, F.lit(" "), F.col("nameOfCounty"),
    )
    return CONTRACT.conform(
        physical.select(
            F.col("SchoolKey"),
            F.col("SchoolName"),
            descriptor_code_value("schoolTypeDescriptor").alias("SchoolType"),
            school_address.alias("SchoolAddress"),
            F.col("city").alias("SchoolCity"),
            F.col("nameOfCounty").alias("SchoolCounty"),
            state_code.alias("SchoolState"),
            null_to_empty("LocalEducationAgencyName").alias("LocalEducationAgencyName"),
            null_to_empty("leaId").alias("LocalEducationAgencyKey"),
            null_to_empty("StateEducationAgencyName").alias("StateEducationAgencyName"),
            null_to_empty("seaId").alias("StateEducationAgencyKey"),
            null_to_empty("EducationServiceCenterName")
            .alias("EducationServiceCenterName"),
            null_to_empty("escId").alias("EducationServiceCenterKey"),
        ),
        spark,
    )
