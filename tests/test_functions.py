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


def test_logistic_quality_monotone(spark):
    import pyspark.sql.functions as F
    from api_to_amt_data_lake_spark.operators.text import logistic_quality

    docs = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten " * 12),
         (2, "spam ,,,, !!!! ;;;; .... ::::"),
         (3, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["q"] for r in docs.select(
        "doc_id", logistic_quality("text").alias("q")).collect()}
    assert 0.0 < out[2] < out[1] <= 1.0     # punct-heavy scores below clean
    assert all(0.0 <= v <= 1.0 for v in out.values())


def test_vocab_coverage_prefix_semantics(spark):
    from api_to_amt_data_lake_spark.operators.text import vocab_coverage

    # counts: a=8 b=4 c=2 d=1 e=1  (total 16)
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d", "e"])
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = {r["word"]: r for r in vocab_coverage(
        df, "text", coverage=0.75).collect()}
    # prefix must be exactly a (8/16=0.5) then b (12/16=0.75): c starts
    # at cum-before=0.75 which is NOT < 0.75
    assert set(rows) == {"a", "b"}
    assert rows["a"]["rank"] == 1 and rows["a"]["cum_share"] == 0.5
    assert rows["b"]["rank"] == 2 and rows["b"]["cum_share"] == 0.75


def test_vocab_coverage_matches_naive_window(spark):
    import pyspark.sql.functions as F
    from pyspark.sql import Window
    from api_to_amt_data_lake_spark.operators.text import tokens, vocab_coverage

    import random
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    docs = [(i, " ".join(rng.choices(vocab, weights=range(1, 31), k=50)))
            for i in range(40)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    fast = vocab_coverage(df, "text", coverage=0.9)
    wf = (df.select(F.explode(tokens("text")).alias("word"))
          .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.orderBy(F.col("cnt").desc(), F.col("word").asc())
    tot = wf.agg(F.sum("cnt").cast("double").alias("t"))
    naive = (wf.withColumn("cum", F.sum("cnt").over(
                 w.rowsBetween(Window.unboundedPreceding, 0)))
             .withColumn("rank", F.row_number().over(w).cast("long"))
             .crossJoin(tot)
             .filter((F.col("cum") - F.col("cnt")) / F.col("t") < 0.9)
             .select("word", "cnt", "rank",
                     F.round(F.col("cum") / F.col("t"), 6).alias("cum_share")))
    assert sorted(map(tuple, fast.collect())) == \
        sorted(map(tuple, naive.collect()))
