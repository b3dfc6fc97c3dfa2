"""date_dim — calendar date dimension.

Parity target: reference `parquet/amt/base/date_dim/main.py` (RESULT_COLUMNS
`main.py:23-33`, derivations `main.py:68-79`). One source (calendarDates),
no joins; exercises F6-F9, F17, A12 and the contract machinery.

Notes on faithful semantics:
- Day/Month are the zero-padded string parts of the ISO date split
  (reference splits the *string*, so '03' not 3).
- DateKey is the concatenation of those parts (yyyymmdd).
- Missing schoolYear → 'Unknown' (reference replace_null `main.py:97`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import month_name, quarter_name
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import read_collection

CONTRACT = ViewContract(
    name="dateDim",
    columns=(
        "DateKey", "Date", "Day", "Month", "MonthName",
        "CalendarQuarter", "CalendarQuarterName", "Year", "SchoolYear",
    ),
    types={"Date": "date"},
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    src = read_collection(spark, silver_root, school_year, "calendarDates")
    if src is None or "date" not in src.columns:
        return CONTRACT.empty(spark)

    school_year_col = (
        F.col("calendarReference.schoolYear").cast("string")
        if "calendarReference" in src.columns else F.lit(None).cast("string")
    )
    base = src.select(
        F.col("date").cast("string").alias("date_str"),
        school_year_col.alias("SchoolYear"),
    ).distinct()

    parts = F.split(F.col("date_str"), "-")
    d = F.to_date("date_str")
    return CONTRACT.conform(
        base.select(
            F.concat(parts[0], parts[1], parts[2]).alias("DateKey"),
            d.alias("Date"),
            parts[2].alias("Day"),
            parts[1].alias("Month"),
            month_name(d).alias("MonthName"),
            F.quarter(d).cast("string").alias("CalendarQuarter"),
            quarter_name(d).alias("CalendarQuarterName"),
            parts[0].alias("Year"),
            F.coalesce(F.col("SchoolYear"), F.lit("Unknown")).alias("SchoolYear"),
        ),
        spark,
    )
