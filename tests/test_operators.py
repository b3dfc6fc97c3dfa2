"""Tests for relational operator idioms (SURVEY.md §2.3-§2.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators import (
    crosstab_count,
    interval_join,
    pivot_first,
    string_agg_ordered,
)
from api_to_amt_data_lake_spark.sources.lookup import with_descriptor_constant


def test_crosstab_count_stable_schema(spark):
    df = spark.createDataFrame(
        [("s1", "A"), ("s1", "A"), ("s1", "B"), ("s2", "B")], ["k", "cat"])
    out = crosstab_count(df, ["k"], "cat", ["A", "B", "C"],
                         rename={"A": "cnt_a", "B": "cnt_b", "C": "cnt_c"})
    rows = {r["k"]: r for r in out.collect()}
    assert rows["s1"]["cnt_a"] == 2 and rows["s1"]["cnt_b"] == 1
    # Absent category still present, zero-filled (pd.crosstab parity risk 1).
    assert rows["s1"]["cnt_c"] == 0 and rows["s2"]["cnt_a"] == 0


def test_pivot_first(spark):
    df = spark.createDataFrame(
        [("p1", "Home", "123"), ("p1", "Work", "456"), ("p2", "Home", "789")],
        ["pid", "type", "phone"])
    out = pivot_first(df, ["pid"], "type", ["Home", "Work", "Mobile"], "phone")
    rows = {r["pid"]: r for r in out.collect()}
    assert rows["p1"]["Home"] == "123" and rows["p1"]["Work"] == "456"
    assert rows["p2"]["Work"] is None and rows["p2"]["Mobile"] is None


def test_string_agg_ordered_desc(spark):
    df = spark.createDataFrame(
        [("g", "b", 2), ("g", "a", 1), ("g", "c", 3)], ["k", "v", "o"])
    out = string_agg_ordered(df, ["k"], "v", order_by=["o"], sep="|",
                             descending=True, out_name="joined")
    assert out.collect()[0]["joined"] == "c|b|a"


def test_interval_join_open_ended(spark):
    events = spark.createDataFrame(
        [(1, "20230901"), (1, "20231225"), (2, "20230901")], ["sid", "dk"])
    spans = spark.createDataFrame(
        [(1, "20230801", ""), (2, "20230801", "20230815")],
        ["sid_r", "entry", "exit"])
    out = interval_join(
        events, spans, [("sid", "sid_r")], point="dk", start="entry",
        end="exit", end_open_means_current=True)
    got = {(r["sid"], r["dk"]) for r in out.collect()}
    # sid=1 open-ended span keeps both dates; sid=2 span ended before 0901.
    assert got == {(1, "20230901"), (1, "20231225")}


def test_descriptor_constant_crosswalk(spark):
    df = spark.createDataFrame(
        [("uri://ed-fi.org/AddressTypeDescriptor#physical",),   # case-insens
         ("uri://ed-fi.org/AddressTypeDescriptor#Nonsense",)], ["d"])
    out = with_descriptor_constant(df, "d")
    rows = sorted(out.collect(), key=lambda r: r["d_codeValue"])
    assert rows[1]["d_constantName"] == "Address.Physical"
    assert rows[0]["d_constantName"] is None  # unmatched kept (right-join parity)


def test_apply_tombstones(spark):
    from api_to_amt_data_lake_spark.operators.merge import apply_tombstones
    data = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], ["id", "v"])
    deletes = spark.createDataFrame([("b",), ("b",), ("x",)], ["id"])
    rows = {r["id"]: r["v"] for r in apply_tombstones(data, deletes, ["id"]).collect()}
    assert rows == {"a": 1, "c": 3}


def test_upsert_latest(spark):
    from api_to_amt_data_lake_spark.operators.merge import upsert_latest
    base = spark.createDataFrame(
        [("a", 1, "old-a"), ("b", 5, "old-b")],
        ["id", "_changeVersion", "payload"])
    updates = spark.createDataFrame(
        [("a", 3, "new-a"),    # newer → replaces
         ("b", 5, "dup-b"),    # tie → update side wins
         ("c", 1, "new-c")],   # insert
        ["id", "_changeVersion", "payload"])
    rows = {r["id"]: (r["_changeVersion"], r["payload"])
            for r in upsert_latest(base, updates, ["id"]).collect()}
    assert rows == {"a": (3, "new-a"), "b": (5, "dup-b"), "c": (1, "new-c")}
