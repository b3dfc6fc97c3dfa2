"""student_discipline_action_dim — discipline actions per active
enrollment, with the acting staff as UserKey.

Parity target: `parquet/amt/equity/student_discipline_action_dim/main.py`.
Chain: disciplineActions exploded on `disciplines` (recordPath,
`main.py:54-66`) ⟕ the same collection exploded on `staffs`
(`main.py:70-104`, left join on the action natural key — fans out per
staff) ⟕ disciplineDescriptors (on parsed code value, `main.py:144-152`)
⋈ studentSchoolAssociations (active filter, null exit passes —
`main.py:198`), then the 4-part key (`main.py:205-213`).
"""

from __future__ import annotations

from datetime import date as _date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.descriptors import (
    descriptor_code_value,
)
from api_to_amt_data_lake_spark.functions.keys import sk_concat_strict
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    array_col,
    col_or_null,
    read_collection,
)

CONTRACT = ViewContract(
    name="equity_StudentDisciplineActionDim",
    columns=(
        "StudentDisciplineActionKey", "StudentSchoolKey", "DisciplineDateKey",
        "StudentKey", "SchoolKey", "DisciplineActionDescription", "UserKey",
    ),
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    da = read_collection(spark, silver_root, school_year, "disciplineActions")
    dd = read_collection(spark, silver_root, school_year,
                         "disciplineDescriptors")
    ssa = read_collection(spark, silver_root, school_year,
                          "studentSchoolAssociations")
    if any(x is None for x in (da, dd, ssa)):
        return CONTRACT.empty(spark)

    today_key = (run_date or _date.today().isoformat()).replace("-", "")[:8]

    base_key = [
        F.col("disciplineActionIdentifier").cast("string")
        .alias("_action_id"),
        date_key(F.col("disciplineDate")).alias("DisciplineDateKey"),
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("StudentKey"),
    ]
    actions = da.select(
        *base_key,
        F.explode("disciplines").alias("_disc"),
    ).select(
        "_action_id", "DisciplineDateKey", "StudentKey",
        descriptor_code_value(F.col("_disc.disciplineDescriptor"))
        .alias("_dd_cv"),
    )
    staffs = da.select(
        *base_key,
        F.explode(array_col(
            da, "staffs",
            "struct<staffReference:struct<staffUniqueId:string>>"))
        .alias("_staff"),
    ).select(
        "_action_id", "DisciplineDateKey", "StudentKey",
        F.col("_staff.staffReference.staffUniqueId").alias("UserKey"),
    )
    descriptors = dd.select(
        F.col("codeValue").alias("_dd_cv"),
        F.col("description").alias("DisciplineActionDescription"),
    )
    enroll = ssa.select(
        F.col("schoolReference.schoolId").cast("string").alias("SchoolKey"),
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("StudentKey"),
        date_key(col_or_null(ssa, "exitWithdrawDate")).alias("_exit"),
    )

    result = (
        actions
        .join(staffs, ["_action_id", "DisciplineDateKey", "StudentKey"], "left")
        .withColumn("UserKey", F.coalesce(F.col("UserKey"), F.lit("")))
        .join(F.broadcast(descriptors), "_dd_cv", "left")
        .join(enroll, "StudentKey", "inner")
        .filter(F.col("_exit").isNull() | (F.col("_exit") >= today_key))
    )
    return CONTRACT.conform(
        result.select(
            sk_concat_strict("_action_id", "DisciplineDateKey", "StudentKey",
                             "SchoolKey").alias("StudentDisciplineActionKey"),
            sk_concat_strict("StudentKey", "SchoolKey")
            .alias("StudentSchoolKey"),
            "DisciplineDateKey", "StudentKey", "SchoolKey",
            "DisciplineActionDescription", "UserKey",
        ),
        spark,
    )
