"""Unit tests for the expression library (SURVEY.md §2.7 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions import (
    date_key,
    descriptor_code_value,
    descriptor_name,
    month_name,
    quarter_name,
    ref_from_href,
    sk_concat,
    sk_concat_strict,
)
from api_to_amt_data_lake_spark.functions.nulls import (
    add_column_if_not_exists,
    empty_to_null,
    replace_null_empty,
)


def one(df, col):
    return df.select(col.alias("v")).collect()[0]["v"]


def test_descriptor_parse(spark):
    df = spark.createDataFrame(
        [("uri://ed-fi.org/GradeLevelDescriptor#Ninth grade",)], ["u"])
    assert one(df, descriptor_code_value("u")) == "Ninth grade"
    assert one(df, descriptor_name("u")) == "GradeLevelDescriptor"


def test_descriptor_parse_no_hash_passthrough(spark):
    # pandas split('#')[-1] of a value with no '#' is the value itself.
    df = spark.createDataFrame([("plain",)], ["u"])
    assert one(df, descriptor_code_value("u")) == "plain"


def test_ref_from_href(spark):
    df = spark.createDataFrame(
        [("https://api.ed-fi.org/v5.2/api/data/v3/ed-fi/schools/abc-123",)], ["h"])
    assert one(df, ref_from_href("h")) == "abc-123"


def test_date_key_variants(spark):
    df = spark.createDataFrame(
        [("2023-08-15", "20230815")], ["iso", "already_key"])
    assert one(df, date_key("iso")) == "20230815"
    # Already-keyed values pass through (reference to_datetime_key quirk).
    assert one(df, date_key("already_key")) == "20230815"


def test_month_quarter_names(spark):
    df = spark.createDataFrame([("2023-08-15",)], ["d"])
    assert one(df, month_name("d")) == "August"
    assert one(df, quarter_name("d")) == "Third"


def test_sk_concat_null_as_empty(spark):
    df = spark.createDataFrame([("a", None, "c")], "x string, y string, z string")
    assert one(df, sk_concat("x", "y", "z")) == "a--c"


def test_sk_concat_strict_null_propagates(spark):
    df = spark.createDataFrame([("a", None, "c")], "x string, y string, z string")
    assert one(df, sk_concat_strict("x", "y", "z")) is None


def test_null_helpers(spark):
    df = spark.createDataFrame([("", None)], "e string, n string")
    assert one(df, empty_to_null("e")) is None
    assert one(df, replace_null_empty("e", "X")) == "X"
    assert one(df, replace_null_empty("n", "X")) == "X"
    df2 = add_column_if_not_exists(df, "extra", "d")
    assert df2.collect()[0]["extra"] == "d"
    assert add_column_if_not_exists(df2, "extra", "zzz").collect()[0]["extra"] == "d"
