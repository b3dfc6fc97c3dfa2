"""student_school_demographics_bridge — demographic membership per active
school enrollment.

Parity target: `parquet/amt/base/student_school_demographics_bridge/main.py`
(RESULT_COLUMNS `main.py:31-35`). Chain: six demographic families exploded
from studentEducationOrganizationAssociations (see `_student_demographics`)
UNION ALL'd (`main.py:135-151`), left-joined to studentSchoolAssociations on
(SchoolKey, StudentKey) (`main.py:153-167`), keys concatenated
(`main.py:169-176`), then the active-enrollment filter
`exitWithdrawDateKey >= today` (`main.py:177-181`).

Reference quirk reproduced: `to_datetime_key` renders a missing
exitWithdrawDate as the string 'nan' (`pandasWrapper.py:143-144`), which
compares `>=` any yyyymmdd key — so students with no exit date AND
demographic rows with no enrollment match at all survive the filter. In
Spark terms: `exit IS NULL OR exit >= today`.

Scale: the SEOA explode is narrow; the single shuffle is the
(SchoolKey, StudentKey) join, both sides pre-projected to key columns.
"""

from __future__ import annotations

from datetime import date as _date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.amt.base._student_demographics import (
    demographic_rows,
)
from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.keys import sk_concat_strict
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    col_or_null,
    read_collection,
)

CONTRACT = ViewContract(
    name="studentSchoolDemographicsBridge",
    columns=("StudentSchoolDemographicBridgeKey", "StudentSchoolKey",
             "DemographicKey"),
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    seoa = read_collection(spark, silver_root, school_year,
                           "studentEducationOrganizationAssociations")
    ssa = read_collection(spark, silver_root, school_year,
                          "studentSchoolAssociations")
    if seoa is None or ssa is None:
        return CONTRACT.empty(spark)

    today_key = (run_date or _date.today().isoformat()).replace("-", "")[:8]

    demo = demographic_rows(seoa).select(
        "StudentKey",
        F.col("EducationOrganizationId").alias("SchoolKey"),
        "DemographicKey",
    )
    enroll = ssa.select(
        F.col("schoolReference.schoolId").cast("string").alias("SchoolKey"),
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("StudentKey"),
        date_key(col_or_null(ssa, "exitWithdrawDate")).alias("_exit"),
    )

    result = (
        demo.join(enroll, ["SchoolKey", "StudentKey"], "left")
        .filter(F.col("_exit").isNull() | (F.col("_exit") >= today_key))
    )
    student_school = sk_concat_strict("StudentKey", "SchoolKey")
    return CONTRACT.conform(
        result.select(
            sk_concat_strict("DemographicKey", student_school)
            .alias("StudentSchoolDemographicBridgeKey"),
            student_school.alias("StudentSchoolKey"),
            "DemographicKey",
        ),
        spark,
    )
