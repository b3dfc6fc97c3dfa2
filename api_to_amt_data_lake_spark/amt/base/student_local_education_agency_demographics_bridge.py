"""student_local_education_agency_demographics_bridge — demographic
membership per active LEA enrollment.

Parity target:
`parquet/amt/base/student_local_education_agency_demographics_bridge/main.py`.
Differences from the school bridge (`diff` of the two mains):

- demographics rows are filtered to LEA-level associations
  (`educationOrganizationReference.link.rel == 'LocalEducationAgency'`,
  `main.py:387-394`);
- enrollment comes from studentSchoolAssociations *resolved to the LEA*:
  school reference href → schools → localEducationAgencyReference href
  (`main.py:87-125,164-172`), with the active filter
  `exitWithdrawDateKey >= today` applied before the join
  (`main.py:153-157` — missing dates pass via the 'nan' quirk);
- the final join is INNER on (lea reference id, student reference id)
  (`main.py:205-219`), i.e. href-derived resource ids, not natural keys;
- keys: StudentLocalEducationAgencyKey = StudentKey-LocalEducationAgencyId,
  bridge key prefixes the DemographicKey (`main.py:406-414`).

Scale: schools is a small dim — broadcast onto the SSA scan; the one real
shuffle is the final (leaRef, studentRef) join.
"""

from __future__ import annotations

from datetime import date as _date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.amt.base._student_demographics import (
    demographic_rows,
)
from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.descriptors import ref_from_href
from api_to_amt_data_lake_spark.functions.keys import sk_concat_strict
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    col_or_null,
    read_collection,
)

CONTRACT = ViewContract(
    name="studentLocalEducationAgencyDemographicsBridge",
    columns=("StudentSchoolDemographicBridgeKey",
             "StudentLocalEducationAgencyKey", "DemographicKey"),
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    seoa = read_collection(spark, silver_root, school_year,
                           "studentEducationOrganizationAssociations")
    ssa = read_collection(spark, silver_root, school_year,
                          "studentSchoolAssociations")
    schools = read_collection(spark, silver_root, school_year, "schools")
    if seoa is None or ssa is None or schools is None:
        return CONTRACT.empty(spark)

    today_key = (run_date or _date.today().isoformat()).replace("-", "")[:8]

    school_lea = schools.select(
        F.col("id").alias("_school_ref_id"),
        ref_from_href(
            col_or_null(schools, "localEducationAgencyReference.link.href"))
        .alias("_lea_ref_id"),
    ).filter(
        F.col("_lea_ref_id").isNotNull() & (F.col("_lea_ref_id") != "")
    ).select("_school_ref_id", "_lea_ref_id")

    enroll = ssa.select(
        ref_from_href(col_or_null(ssa, "schoolReference.link.href"))
        .alias("_school_ref_id"),
        ref_from_href(col_or_null(ssa, "studentReference.link.href"))
        .alias("_student_ref_id"),
        date_key(col_or_null(ssa, "exitWithdrawDate")).alias("_exit"),
    ).filter(
        F.col("_exit").isNull() | (F.col("_exit") >= today_key)
    ).join(F.broadcast(school_lea), "_school_ref_id", "inner").select(
        "_lea_ref_id", "_student_ref_id",
    )

    demo = demographic_rows(seoa).filter(
        F.col("_ed_org_rel") == "LocalEducationAgency"
    ).select(
        "StudentKey",
        F.col("EducationOrganizationId").alias("LocalEducationAgencyId"),
        F.col("_ed_org_ref_id").alias("_lea_ref_id"),
        "_student_ref_id",
        "DemographicKey",
    )

    result = demo.join(enroll, ["_lea_ref_id", "_student_ref_id"], "inner")
    student_lea = sk_concat_strict("StudentKey", "LocalEducationAgencyId")
    return CONTRACT.conform(
        result.select(
            sk_concat_strict("DemographicKey", student_lea)
            .alias("StudentSchoolDemographicBridgeKey"),
            student_lea.alias("StudentLocalEducationAgencyKey"),
            "DemographicKey",
        ),
        spark,
    )
