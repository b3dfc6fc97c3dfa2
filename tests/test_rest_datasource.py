"""Spark 4 Python Data Source for paginated collections
(sources/rest_datasource.py): strided until-empty partitioning."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.sources import rest_datasource


@pytest.fixture(scope="module")
def paged_dir(tmp_path_factory):
    """7 pages: 6 full pages of 4 records + a partial final page of 2."""
    d = tmp_path_factory.mktemp("pages")
    limit = 4
    rid = 0
    for page in range(7):
        n = limit if page < 6 else 2
        recs = [{"id": rid + j, "name": f"rec{rid + j}"} for j in range(n)]
        rid += n
        (d / f"page-{page:05d}.json").write_text(json.dumps(recs))
    return str(d), rid  # 26 records


def _read(spark, path, **opts):
    rest_datasource.register(spark)
    r = spark.read.format("paged_collection").option("path", path)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_reads_every_record_exactly_once(spark, paged_dir):
    path, total = paged_dir
    df = _read(spark, path, page_limit=4, num_partitions=3)
    rows = df.collect()
    assert len(rows) == total
    offsets = sorted(r.offset for r in rows)
    assert offsets == list(range(total))  # dense, no dupes, no gaps


def test_partition_count_independent_of_result(spark, paged_dir):
    path, total = paged_dir
    one = _read(spark, path, page_limit=4, num_partitions=1)
    many = _read(spark, path, page_limit=4, num_partitions=5)
    assert sorted(r.offset for r in one.collect()) == \
        sorted(r.offset for r in many.collect())
    assert many.rdd.getNumPartitions() == 5


def test_payload_parses_downstream_with_from_json(spark, paged_dir):
    path, _ = paged_dir
    df = _read(spark, path, page_limit=4, num_partitions=2)
    parsed = df.select(
        F.from_json("payload", "id long, name string").alias("r")
    ).select("r.*")
    assert parsed.where(F.col("name") == "rec0").count() == 1
    assert parsed.agg(F.max("id")).collect()[0][0] == 25


def test_empty_collection_yields_empty_frame(spark, tmp_path):
    df = _read(spark, str(tmp_path), page_limit=4, num_partitions=3)
    assert df.count() == 0
    assert df.columns == ["offset", "page", "payload"]


def test_pattern_option_reads_landed_silver_layout(spark, tmp_path):
    (tmp_path / "students_page00000.json").write_text(
        json.dumps([{"id": 1}]))
    df = _read(spark, str(tmp_path), page_limit=4, num_partitions=2,
               file_pattern="students_page{page:05d}.json")
    assert df.count() == 1


def test_streaming_tail_picks_up_new_pages(spark, tmp_path):
    """readStream over the paged collection: new pages (and the tail of
    a partially-filled page) arrive in later micro-batches, each record
    exactly once."""
    import time
    d = tmp_path / "pages"
    d.mkdir()
    limit = 3
    (d / "page-00000.json").write_text(json.dumps(
        [{"id": 0}, {"id": 1}, {"id": 2}]))
    (d / "page-00001.json").write_text(json.dumps([{"id": 3}]))  # partial tail

    rest_datasource.register(spark)
    stream = (
        spark.readStream.format("paged_collection")
        .option("path", str(d)).option("page_limit", str(limit)).load()
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (stream.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 4:
                    break
            except Exception:
                pass
            time.sleep(1)
        # grow the tail page to full and add one more page
        (d / "page-00001.json").write_text(json.dumps(
            [{"id": 3}, {"id": 4}, {"id": 5}]))
        (d / "page-00002.json").write_text(json.dumps([{"id": 6}]))
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 7:
                    break
            except Exception:
                pass
            time.sleep(1)
    finally:
        q.stop()
    got = spark.read.parquet(out)
    offsets = sorted(r.offset for r in got.collect())
    assert offsets == list(range(7))  # every record exactly once, no dupes
