"""rls_student_data_authorization — section enrollment spans per student.

Parity target: `parquet/amt/rls/rls_student_data_authorization/main.py`.
One pass over studentSectionAssociations (`main.py:42-57`): parse
begin/end dates (`to_datetime`, `main.py:58-62` — timestamps in the
output), derive yyyymmdd date keys via `strftime` (null-safe: missing
dates yield null keys, `main.py:61-62`), section id from the reference
href (`main.py:69`).

Scale: narrow projection of a single scan — no joins, no shuffle; the
date parsing is whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.descriptors import ref_from_href
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    col_or_null,
    read_collection,
)

CONTRACT = ViewContract(
    name="rls_StudentDataAuthorization",
    columns=("StudentKey", "SchoolKey", "SectionId", "BeginDate", "EndDate",
             "BeginDateKey", "EndDateKey"),
    types={"BeginDate": "timestamp", "EndDate": "timestamp"},
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    ssa = read_collection(spark, silver_root, school_year,
                          "studentSectionAssociations")
    if ssa is None:
        return CONTRACT.empty(spark)

    begin = F.to_timestamp(col_or_null(ssa, "beginDate"))
    end = F.to_timestamp(col_or_null(ssa, "endDate"))
    return CONTRACT.conform(
        ssa.select(
            F.col("studentReference.studentUniqueId").cast("string")
            .alias("StudentKey"),
            F.col("sectionReference.schoolId").cast("string")
            .alias("SchoolKey"),
            ref_from_href(col_or_null(ssa, "sectionReference.link.href"))
            .alias("SectionId"),
            begin.alias("BeginDate"),
            end.alias("EndDate"),
            F.date_format(begin, "yyyyMMdd").alias("BeginDateKey"),
            F.date_format(end, "yyyyMMdd").alias("EndDateKey"),
        ),
        spark,
    )
