"""Structured Streaming: the windowed-counts transform produces identical
results through the streaming path (availableNow file source) and the
batch path."""

from __future__ import annotations

from api_to_amt_data_lake_spark.sources.parquet_io import read_table
from api_to_amt_data_lake_spark.streaming.events import (
    EVENT_SCHEMA,
    hourly_event_counts,
    stream_hourly_event_counts,
)


def test_stream_matches_batch(spark, tmp_path, sf_dir):
    events = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.write.parquet(src)

    q = stream_hourly_event_counts(
        spark,
        source_dir=src,
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_dir=str(tmp_path / "out"),
        available_now=True,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "out"))
    want = hourly_event_counts(spark.read.schema(EVENT_SCHEMA).parquet(src))
    key = ["window_start", "event_type"]
    n_got, n_want = got.count(), want.count()
    # Append mode only emits windows the watermark has closed: every emitted
    # row must match batch exactly; only the tail windows still inside the
    # 2h watermark may be withheld (≤ 3 hourly windows × 5 event types).
    assert 0 < n_want - n_got <= 15
    assert got.join(want, key + ["n_events", "value_sum"]).count() == n_got
    held_back = want.join(got, key, "left_anti")
    import pyspark.sql.functions as F
    max_start = want.agg(F.max("window_start")).collect()[0][0]
    cutoff = [r["window_start"] for r in held_back.collect()]
    assert all((max_start - ws).total_seconds() <= 3 * 3600 for ws in cutoff)


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionization: sessions closed by a later
    event OR by the event-time timeout must match the batch binding; the
    still-open tail session must be withheld."""
    from datetime import datetime, timedelta

    from pyspark.sql import types as T

    from api_to_amt_data_lake_spark.streaming.sessionize import (
        sessionize_batch,
        sessionize_stream,
    )

    t0 = datetime(2024, 3, 1, 8, 0, 0)
    m = timedelta(minutes=1)
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
    ])
    # file 1: user 1 session A (2 ev) then gap >30m; user 2 session D (2 ev)
    batch1 = [
        (1, t0, 1), (1, t0 + 10 * m, 2),
        (1, t0 + 120 * m, 3), (1, t0 + 125 * m, 4),
        (2, t0 + 30 * m, 5), (2, t0 + 40 * m, 6),
    ]
    # file 2: user 1 session C; user 2 session E; sentinel advances the
    # watermark ~100h so every session above times out and flushes.
    batch2 = [
        (1, t0 + 360 * m, 7),
        (2, t0 + 300 * m, 8),
        (99, t0 + 6000 * m, 9),
    ]
    src = tmp_path / "sess_src"
    src.mkdir()
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        str(src / "f1"))
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
        str(src / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        sessionize_stream(stream, watermark="1 hour")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "sess_out"))
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(str(tmp_path / "sess_out")).collect()
    }
    all_events = spark.createDataFrame(batch1 + batch2, schema)
    want_all = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(all_events).collect()
    }
    open_tail = {w for w in want_all if w[0] == 99}  # sentinel stays open
    assert got == want_all - open_tail
    assert len(got) == 5


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate keys inside the horizon are
    dropped; each distinct key is emitted exactly once."""
    from datetime import datetime, timedelta

    from pyspark.sql import types as T

    from api_to_amt_data_lake_spark.streaming.dedup import dedup_stream

    t0 = datetime(2024, 3, 1, 8, 0, 0)
    m = timedelta(minutes=1)
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("payload", T.StringType()),
    ])
    rows = [
        (1, t0, "first"), (1, t0 + 5 * m, "dup-close"),
        (2, t0 + 2 * m, "first"),
        (1, t0 + 20 * m, "dup-still-inside"),
        (3, t0 + 30 * m, "first"),
    ]
    src = tmp_path / "dd_src"
    src.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(src / "f1"))

    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = (
        dedup_stream(stream, ["k"], watermark="1 hour")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "dd_out"))
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        (r.k, r.payload)
        for r in spark.read.parquet(str(tmp_path / "dd_out")).collect()
    )
    assert got == [(1, "first"), (2, "first"), (3, "first")]


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream time-bounded join: purchases within 30 min after a
    click, per user; results must equal the equivalent batch join."""
    from datetime import datetime, timedelta

    from pyspark.sql import types as T

    from api_to_amt_data_lake_spark.streaming.joins import (
        stream_interval_join,
    )

    t0 = datetime(2024, 3, 1, 8, 0, 0)
    m = timedelta(minutes=1)
    cs = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("click_ts", T.TimestampType()),
        T.StructField("click_id", T.LongType()),
    ])
    ps = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("purchase_ts", T.TimestampType()),
        T.StructField("amount", T.DoubleType()),
    ])
    clicks = [
        (1, t0, 1), (1, t0 + 60 * m, 2), (2, t0 + 5 * m, 3),
    ]
    purchases = [
        (1, t0 + 10 * m, 9.5),     # matches click 1 (10m after)
        (1, t0 + 75 * m, 20.0),    # matches click 2 (15m after)
        (2, t0 + 50 * m, 7.0),     # 45m after click 3 -> no match
    ]
    cdir, pdir = tmp_path / "clicks", tmp_path / "purch"
    cdir.mkdir(), pdir.mkdir()
    spark.createDataFrame(clicks, cs).coalesce(1).write.parquet(
        str(cdir / "f1"))
    spark.createDataFrame(purchases, ps).coalesce(1).write.parquet(
        str(pdir / "f1"))

    cstream = spark.readStream.schema(cs).parquet(str(cdir / "*"))
    pstream = spark.readStream.schema(ps).parquet(str(pdir / "*"))
    joined = stream_interval_join(
        cstream, pstream, key="user_id",
        left_ts="click_ts", right_ts="purchase_ts",
        lower_seconds=0, upper_seconds=1800,
    ).select("l.user_id", "click_id", "amount")
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "ssj_out"))
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        (r.user_id, r.click_id, r.amount)
        for r in spark.read.parquet(str(tmp_path / "ssj_out")).collect()
    )
    assert got == [(1, 1, 9.5), (1, 2, 20.0)]


def test_stream_upsert_gold_multi_batch(spark, tmp_path):
    """Documents replayed as a 2-file stream (one file per micro-batch)
    must leave the same current snapshot a single batch upsert would:
    newest version per key wins across batch boundaries."""
    import json as _json

    from api_to_amt_data_lake_spark.sources.incremental import read_snapshot
    from api_to_amt_data_lake_spark.streaming.sink import stream_upsert_gold

    src = tmp_path / "src"
    src.mkdir()
    batch1 = [{"id": "a", "v": 1, "name": "alpha"},
              {"id": "b", "v": 1, "name": "bravo"}]
    batch2 = [{"id": "a", "v": 2, "name": "ALPHA2"},
              {"id": "c", "v": 2, "name": "charlie"}]
    (src / "part1.json").write_text("\n".join(map(_json.dumps, batch1)))
    (src / "part2.json").write_text("\n".join(map(_json.dumps, batch2)))

    schema = "id string, v long, name string"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).json(str(src)))
    q = stream_upsert_gold(
        stream, str(tmp_path / "snap"), 2023, "docs",
        key_col="id", version_col="v",
        checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(timeout=300)
    if q.isActive:
        q.stop()

    snap = read_snapshot(spark, str(tmp_path / "snap"), 2023, "docs")
    got = {r["id"]: (r["v"], r["name"]) for r in snap.collect()}
    assert got == {"a": (2, "ALPHA2"), "b": (1, "bravo"),
                   "c": (2, "charlie")}


def test_fold_batch_skips_replayed_batch_ids(spark, tmp_path):
    """A replayed micro-batch (same batch id) is skipped via the recorded
    marker — no new snapshot version; a genuinely new batch id folds."""
    from api_to_amt_data_lake_spark.sources.incremental import (
        current_version,
        read_snapshot,
    )
    from api_to_amt_data_lake_spark.streaming.sink import (
        fold_batch,
        last_applied_batch,
    )

    root = str(tmp_path / "snap")
    b0 = spark.createDataFrame([("a", 1, "alpha")],
                               "id string, v long, name string")
    assert fold_batch(spark, b0, 0, root, 2023, "ep",
                      key_col="id", version_col="v") is True
    v_after = current_version(root, 2023, "ep")
    assert last_applied_batch(root, 2023, "ep") == 0

    # Replay of batch 0: skipped, version unchanged.
    assert fold_batch(spark, b0, 0, root, 2023, "ep",
                      key_col="id", version_col="v") is False
    assert current_version(root, 2023, "ep") == v_after

    # New batch id folds and advances the marker.
    b1 = spark.createDataFrame([("a", 2, "ALPHA2")],
                               "id string, v long, name string")
    assert fold_batch(spark, b1, 1, root, 2023, "ep",
                      key_col="id", version_col="v") is True
    assert last_applied_batch(root, 2023, "ep") == 1
    got = {r["id"]: r["name"]
           for r in read_snapshot(spark, root, 2023, "ep").collect()}
    assert got == {"a": "ALPHA2"}


def test_stream_budget_filter_state_spans_batches(spark, tmp_path):
    """Per-source token budgets must carry across micro-batches: spend
    recorded in batch 1's ValueState constrains what batch 2 admits —
    the cross-batch state a watermarked aggregation cannot express."""
    import json as _json

    from api_to_amt_data_lake_spark.streaming.budget import (
        stream_budget_filter,
    )

    src = tmp_path / "src"
    src.mkdir()
    # Batch 1: source a spends 60 of 100; source b spends 90 of 100.
    b1 = [{"source": "a", "doc_id": 1, "n_tokens": 60},
          {"source": "b", "doc_id": 2, "n_tokens": 90}]
    # Batch 2: a can take 30 (90 total) but not the 50 after it;
    # b can take nothing but the 10.
    b2 = [{"source": "a", "doc_id": 3, "n_tokens": 30},
          {"source": "a", "doc_id": 4, "n_tokens": 50},
          {"source": "b", "doc_id": 5, "n_tokens": 20},
          {"source": "b", "doc_id": 6, "n_tokens": 10}]
    (src / "b1.json").write_text("\n".join(map(_json.dumps, b1)))
    (src / "b2.json").write_text("\n".join(map(_json.dumps, b2)))

    try:
        stream = (spark.readStream
                  .schema("source string, doc_id long, n_tokens long")
                  .option("maxFilesPerTrigger", 1).json(str(src)))
        out = stream_budget_filter(stream, budget_per_source=100)
        q = (out.writeStream.format("memory").queryName("budget_out")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(timeout=300)
        if q.isActive:
            q.stop()
        got = {r["doc_id"] for r in spark.sql(
            "SELECT doc_id FROM budget_out").collect()}
        # Admitted: 1 (60), 2 (90), 3 (30 -> a at 90), 6 (10 -> b at 100).
        # Rejected: 4 (a would hit 140), 5 (b would hit 110).
        assert got == {1, 2, 3, 6}
    finally:
        spark.catalog.dropTempView("budget_out") if "budget_out" in [
            t.name for t in spark.catalog.listTables()] else None


def test_stream_neardup_pairs_deltas_union_to_from_scratch(spark, tmp_path):
    """Stream documents in two micro-batches through the LSH index
    maintainer: every batch's emitted delta touches only that batch's
    docs, replayed batch ids are skipped, and the union of deltas equals
    the from-scratch LSH pair set over everything streamed."""
    import json as _json

    from api_to_amt_data_lake_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from api_to_amt_data_lake_spark.streaming.neardup import (
        fold_neardup_batch,
        last_applied_batch,
        read_all_pairs,
        stream_neardup_pairs,
    )

    boiler = "common licence header shared by every near duplicate here"
    b1 = [{"doc_id": i, "text": f"{boiler} variant {i % 2}"}
          for i in range(6)]
    b2 = [{"doc_id": 100 + i, "text": f"{boiler} variant {i % 2}"}
          for i in range(4)]
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text("\n".join(map(_json.dumps, b1)))
    (src / "b2.json").write_text("\n".join(map(_json.dumps, b2)))

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).json(str(src)))
    q = stream_neardup_pairs(stream, index_dir, pairs_dir,
                             "doc_id", "text",
                             checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(timeout=300)
    if q.isActive:
        q.stop()

    assert last_applied_batch(index_dir) == 1
    got = {(r["id_a"], r["id_b"])
           for r in read_all_pairs(spark, pairs_dir).collect()}
    everything = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in b1 + b2], ["doc_id", "text"])
    scratch = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(
        minhash_signatures(everything, "doc_id", "text"),
        "doc_id").collect()}
    assert got == scratch and scratch

    # batch 2's delta involves a batch-2 doc in every pair
    delta2 = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(
        str(tmp_path / "pairs" / "batch=1")).collect()}
    assert delta2 and all(b >= 100 for _, b in delta2)

    # replayed batch id is skipped outright
    replay = spark.createDataFrame([(999, "anything else")],
                                   ["doc_id", "text"])
    assert fold_neardup_batch(spark, replay, 1, index_dir, pairs_dir,
                              "doc_id", "text") is False
    assert {(r["id_a"], r["id_b"])
            for r in read_all_pairs(spark, pairs_dir).collect()} == scratch


def test_stream_scd2_history_matches_batch(spark, tmp_path):
    """Streaming SCD2 maintenance: an observation stream folded batch
    by batch (foreachBatch + scd2_apply(partial=True)) must equal the
    batch build over the full log when batch boundaries align with
    observation timestamps; replayed batch ids are skipped; keys absent
    from a micro-batch are untouched (CDC semantics, not deletion)."""
    from datetime import datetime

    from pyspark.sql import types as T

    from api_to_amt_data_lake_spark.operators.scd import scd2_from_events
    from api_to_amt_data_lake_spark.streaming.scd import (
        fold_scd2_batch,
        last_applied_batch,
        read_history,
        stream_scd2_history,
    )

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("state", T.StringType()),
    ])
    t1, t2 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    batch1 = [(1, t1, "A"), (2, t1, "X"), (3, t1, "K")]
    # batch2: key1 changes, key4 appears, keys 2/3 ABSENT (no news)
    batch2 = [(1, t2, "B"), (4, t2, "N")]
    src = tmp_path / "scd_src"
    src.mkdir()
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        str(src / "f1"))
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
        str(src / "f2"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src / "*")))
    hroot = str(tmp_path / "hist")
    q = stream_scd2_history(
        stream, hroot, "dim", "k", "ts", ["state"],
        checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {(r["k"], r["state"], r["valid_from"], r["valid_to"],
            r["is_current"])
           for r in read_history(spark, hroot, "dim").collect()}
    want = {(r["k"], r["state"], r["valid_from"], r["valid_to"],
             r["is_current"])
            for r in scd2_from_events(
                spark.createDataFrame(batch1 + batch2, schema),
                "k", "ts", ["state"]).collect()}
    assert got == want
    assert sum(1 for r in got if r[4]) == 4  # 1:B, 2:X, 3:K, 4:N current

    # replay safety: re-folding an already-applied batch id is a no-op
    # (capture the history BEFORE the replayed fold — comparing two
    # post-fold reads would be tautologically true).
    before = {tuple(r) for r in read_history(spark, hroot, "dim").collect()}
    last = last_applied_batch(hroot, "dim")
    assert last >= 1
    assert fold_scd2_batch(
        spark, spark.createDataFrame(batch2, schema), last, hroot,
        "dim", "k", "ts", ["state"]) is False
    after = {tuple(r) for r in read_history(spark, hroot, "dim").collect()}
    assert after == before

    # late batch: an out-of-order fold carrying a pre-history timestamp
    # must NOT close key 1's current interval before it opened (the
    # per-key guard ignores the stale row).
    t0 = datetime(2023, 6, 1)
    assert fold_scd2_batch(
        spark, spark.createDataFrame([(1, t0, "STALE")], schema),
        last + 1, hroot, "dim", "k", "ts", ["state"]) is True
    late = {tuple(r) for r in read_history(spark, hroot, "dim").collect()}
    assert late == before


def test_fold_scd2_per_key_timestamps_and_tombstones(spark, tmp_path):
    """A batch mixing observation times stamps each key with ITS OWN
    time (not the batch max); a tombstone row closes the key's current
    interval at the tombstone's time; a delete->reinsert across batches
    reopens."""
    from datetime import datetime

    from pyspark.sql import types as T

    from api_to_amt_data_lake_spark.streaming.scd import (
        fold_scd2_batch,
        read_history,
    )

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("state", T.StringType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    hroot = str(tmp_path / "hist")
    t1, t2, t3, t4 = (datetime(2024, 1, 1), datetime(2024, 2, 1),
                      datetime(2024, 3, 1), datetime(2024, 4, 1))
    fold_scd2_batch(
        spark, spark.createDataFrame(
            [(1, t1, "A", False), (2, t1, "X", False)], schema),
        0, hroot, "dim", "k", "ts", ["state"], tombstone_col="deleted")
    # batch 1: key 1 changes at t2, key 2 changes at t3 — per-key times
    fold_scd2_batch(
        spark, spark.createDataFrame(
            [(1, t2, "B", False), (2, t3, "Y", False)], schema),
        1, hroot, "dim", "k", "ts", ["state"], tombstone_col="deleted")
    hist = {(r["k"], r["state"], r["valid_from"], r["valid_to"],
             r["is_current"])
            for r in read_history(spark, hroot, "dim").collect()}
    assert (1, "A", t1, t2, False) in hist      # closed at ITS t2
    assert (2, "X", t1, t3, False) in hist      # closed at ITS t3
    assert (1, "B", t2, datetime(9999, 12, 31), True) in hist
    assert (2, "Y", t3, datetime(9999, 12, 31), True) in hist

    # batch 2: tombstone for key 1 at t3 — interval closes, none opens
    fold_scd2_batch(
        spark, spark.createDataFrame([(1, t3, None, True)], schema),
        2, hroot, "dim", "k", "ts", ["state"], tombstone_col="deleted")
    hist = {(r["k"], r["state"], r["valid_from"], r["valid_to"],
             r["is_current"])
            for r in read_history(spark, hroot, "dim").collect()}
    assert (1, "B", t2, t3, False) in hist
    assert not any(k == 1 and cur for k, s, f, t, cur in hist)

    # batch 3: key 1 reappears at t4 — a fresh current interval opens
    fold_scd2_batch(
        spark, spark.createDataFrame([(1, t4, "C", False)], schema),
        3, hroot, "dim", "k", "ts", ["state"], tombstone_col="deleted")
    hist = {(r["k"], r["state"], r["valid_from"], r["valid_to"],
             r["is_current"])
            for r in read_history(spark, hroot, "dim").collect()}
    assert (1, "C", t4, datetime(9999, 12, 31), True) in hist
    assert sum(1 for k, s, f, t, cur in hist if k == 1) == 3


def test_stream_value_grids_match_batch_and_merge_up(spark, tmp_path, sf_dir):
    from api_to_amt_data_lake_spark.operators.sketches import (
        grid_quantiles,
        grid_sketch,
    )
    from api_to_amt_data_lake_spark.streaming.quantiles import (
        hourly_value_grids,
        stream_hourly_value_grids,
    )

    events = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "gsrc")
    events.write.parquet(src)

    q = stream_hourly_value_grids(
        spark,
        source_dir=src,
        checkpoint_dir=str(tmp_path / "gckpt"),
        output_dir=str(tmp_path / "gout"),
        key_cols=["event_type"],
        value_col="value",
        bin_width=10,
        available_now=True,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "gout"))
    raw = spark.read.schema(EVENT_SCHEMA).parquet(src)
    want = hourly_value_grids(raw, ["event_type"], "value", 10)
    key = ["bucket_start", "event_type", "bin"]
    n_got, n_want = got.count(), want.count()
    # Append mode withholds only windows still inside the 2h watermark.
    assert 0 < n_got <= n_want
    assert got.join(want, key + ["cnt"]).count() == n_got

    # Mergeability end-to-end: quantiles from the STREAMED hourly
    # partials (merged over all fully-emitted hours) == quantiles from a
    # direct grid over the same hours' raw events.
    import pyspark.sql.functions as F
    emitted_hours = got.select("bucket_start").distinct()
    merged = (got.groupBy("event_type", "bin")
              .agg(F.sum("cnt").alias("cnt")))
    direct = grid_sketch(
        raw.join(
            emitted_hours.withColumnRenamed("bucket_start", "_h"),
            F.date_trunc("hour", F.col("ts")) == F.col("_h"), "left_semi"),
        ["event_type"], "value", 10)
    assert ({tuple(r) for r in
             grid_quantiles(merged, ["event_type"], 10).collect()}
            == {tuple(r) for r in
                grid_quantiles(direct, ["event_type"], 10).collect()})


def test_stream_minu_sketches_match_batch_and_estimate(spark, tmp_path,
                                                       sf_dir):
    from api_to_amt_data_lake_spark.operators.sketches import (
        minu_estimate,
        minu_merge,
        minu_sketch,
    )
    from api_to_amt_data_lake_spark.streaming.distinct import (
        hourly_minu_sketches,
        stream_hourly_minu_sketches,
    )

    events = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "dsrc")
    events.write.parquet(src)

    q = stream_hourly_minu_sketches(
        spark,
        source_dir=src,
        checkpoint_dir=str(tmp_path / "dckpt"),
        output_dir=str(tmp_path / "dout"),
        key_cols=["event_type"],
        distinct_col="user_id",
        k_cells=64,
        available_now=True,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "dout"))
    raw = spark.read.schema(EVENT_SCHEMA).parquet(src)
    want = hourly_minu_sketches(raw, ["event_type"], "user_id",
                                k_cells=64)
    key = ["bucket_start", "event_type", "cell"]
    n_got, n_want = got.count(), want.count()
    # Append mode withholds only windows still inside the watermark.
    assert 0 < n_got <= n_want
    assert got.join(want, key + ["umin"]).count() == n_got

    # Merge-exactness end-to-end: estimates from the STREAMED hourly
    # partials (cell-wise min over fully-emitted hours) == estimates
    # from a direct sketch over the same hours' raw events.
    import pyspark.sql.functions as F
    emitted_hours = got.select("bucket_start").distinct()
    same_hours = raw.join(
        emitted_hours.withColumnRenamed("bucket_start", "_h"),
        F.date_trunc("hour", F.col("ts")) == F.col("_h"), "left_semi")
    merged = minu_merge(got, ["event_type"])
    direct = minu_sketch(same_hours, ["event_type"], "user_id",
                         k_cells=64)
    assert ({tuple(r) for r in
             minu_estimate(merged, ["event_type"], 64).collect()}
            == {tuple(r) for r in
                minu_estimate(direct, ["event_type"], 64).collect()})


def test_stream_trending_fold_matches_batch_recompute(spark, tmp_path,
                                                      sf_dir):
    import math

    import pyspark.sql.functions as F

    from api_to_amt_data_lake_spark.operators.asof import _ts_to_num
    from api_to_amt_data_lake_spark.streaming.trending import (
        decayed_scores_batch,
        read_trending,
        stream_trending,
    )

    events = read_table(spark, sf_dir, "events")
    micros = _ts_to_num(F.col("ts"), dict(events.dtypes)["ts"])
    ev = events.select("event_type", micros.alias("ts_us"))
    src = str(tmp_path / "tsrc")
    # three files -> maxFilesPerTrigger=1 makes three micro-batches
    ev.repartition(3).write.parquet(src)

    stream = (spark.readStream
              .schema("event_type string, ts_us long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = stream_trending(
        stream, state_root=str(tmp_path / "tstate"),
        checkpoint_dir=str(tmp_path / "tckpt"),
        key_cols=["event_type"], ts_us_col="ts_us",
        half_life_s=86_400.0)
    q.awaitTermination(120)

    got = {r.event_type: (r.score, r.as_of_us)
           for r in read_trending(spark, str(tmp_path / "tstate")).collect()}
    ref = ev.agg(F.max("ts_us")).first()[0]
    want = {r.event_type: r.score
            for r in decayed_scores_batch(
                ev, ["event_type"], "ts_us", ref, 86_400.0).collect()}
    assert set(got) == set(want)
    for k, (score, as_of) in got.items():
        assert as_of == ref
        assert math.isclose(score, want[k], rel_tol=1e-9), k


def test_trending_fold_replay_skipped_and_decay_only(spark, tmp_path):
    import math

    from api_to_amt_data_lake_spark.streaming.trending import (
        fold_trending_batch,
        read_trending,
    )

    root = str(tmp_path / "state")
    hl = 100.0
    b0 = spark.createDataFrame([("a", 0), ("b", 0)], "k string, ts long")
    assert fold_trending_batch(spark, b0, 0, root, ["k"], "ts", hl)
    # replayed batch id -> skipped
    assert not fold_trending_batch(spark, b0, 0, root, ["k"], "ts", hl)
    # one half-life later, only key a recurs: b purely decays
    b1 = spark.createDataFrame([("a", 100_000_000)], "k string, ts long")
    assert fold_trending_batch(spark, b1, 1, root, ["k"], "ts", hl)
    got = {r.k: r.score for r in read_trending(spark, root).collect()}
    assert math.isclose(got["b"], 0.5, rel_tol=1e-12)
    assert math.isclose(got["a"], 1.5, rel_tol=1e-12)


def test_stream_cusum_matches_batch_window_algebra(spark, tmp_path,
                                                   sf_dir):
    """The live per-key CUSUM fold must equal the batch window-algebra
    form when micro-batches respect event-time order — split the event
    log into three consecutive time chunks, stream them as three
    batches, compare every row's statistic."""
    import pyspark.sql.functions as F

    from api_to_amt_data_lake_spark.operators.asof import _ts_to_num
    from api_to_amt_data_lake_spark.operators.timeseries import (
        cusum_drift,
    )
    from api_to_amt_data_lake_spark.streaming.drift import stream_cusum

    events = read_table(spark, sf_dir, "events")
    micros = _ts_to_num(F.col("ts"), dict(events.dtypes)["ts"])
    ev = events.select(
        F.col("event_type").alias("key"), "event_id",
        micros.alias("ts_us"), "value")

    src = tmp_path / "csrc"
    src.mkdir()
    qs = ev.approxQuantile("ts_us", [0.33, 0.66], 0.0)
    chunks = [ev.filter(F.col("ts_us") <= qs[0]),
              ev.filter((F.col("ts_us") > qs[0])
                        & (F.col("ts_us") <= qs[1])),
              ev.filter(F.col("ts_us") > qs[1])]
    for i, c in enumerate(chunks):
        c.coalesce(1).write.parquet(str(src / f"b{i}"))

    stream = (spark.readStream
              .schema("key string, event_id long, ts_us long, value double")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "b*")))
    out = stream_cusum(stream, drift_k=2.0, threshold_h=500.0)
    q = (out.writeStream.format("memory").queryName("cusum_out")
         .option("checkpointLocation", str(tmp_path / "cckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = {r.event_id: (r.cusum, r.breach) for r in
           spark.sql("SELECT * FROM cusum_out").collect()}
    want = {r.event_id: (r.cusum, r.breach) for r in cusum_drift(
        ev, ["key"], [F.col("ts_us"), F.col("event_id")], "value",
        drift_k=2.0, threshold_h=500.0).collect()}
    assert set(got) == set(want)
    mism = [e for e in got
            if abs(got[e][0] - want[e][0]) > 1e-9
            or got[e][1] != want[e][1]]
    assert not mism, mism[:5]
    spark.catalog.dropTempView("cusum_out")


def test_stream_ivm_agg_matches_from_scratch(spark, tmp_path):
    """Three CDC micro-batches (inserts, then updates incl. a group
    move, then deletes) folded through the streaming IVM must leave
    state EXACTLY equal to a from-scratch grouped aggregate of the
    final table — DECIMAL sums, so equality is exact, not tolerant."""
    import pyspark.sql.functions as F

    from api_to_amt_data_lake_spark.operators.delta_agg import (
        grouped_sums,
    )
    from api_to_amt_data_lake_spark.sources.incremental import (
        frame_changes,
    )
    from api_to_amt_data_lake_spark.streaming.ivm import (
        read_agg_state,
        stream_maintain_agg,
    )

    from decimal import Decimal

    def tbl(rows):
        return spark.createDataFrame(
            [(i, g, Decimal(str(x))) for i, g, x in rows],
            "id long, g string, x decimal(18,2)")

    v0 = tbl([])
    v1 = tbl([(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)])
    v2 = tbl([(1, "a", 15.0), (2, "c", 20.0), (3, "b", 30.0),
              (4, "b", 5.0)])
    v3 = tbl([(1, "a", 15.0), (4, "b", 5.0)])

    src = tmp_path / "isrc"
    src.mkdir()
    versions = [v0, v1, v2, v3]
    for i in range(3):
        ch = frame_changes(versions[i], versions[i + 1], "id",
                           ["g", "x"], include_old=True)
        ch.coalesce(1).write.parquet(str(src / f"b{i}"))

    schema = ("id long, _change_type string, g string, "
              "x decimal(18,2), _old_g string, _old_x decimal(18,2)")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "b*")))
    q = stream_maintain_agg(
        stream, state_root=str(tmp_path / "istate"),
        checkpoint_dir=str(tmp_path / "ickpt"),
        group_cols=["g"], sum_cols=["x"])
    q.awaitTermination(300)

    got = {tuple(r) for r in
           read_agg_state(spark, str(tmp_path / "istate"))
           .select("g", "n_rows", F.col("sum_x").cast("double"))
           .collect()}
    want = {tuple(r) for r in
            grouped_sums(v3, ["g"], ["x"])
            .select("g", "n_rows", F.col("sum_x").cast("double"))
            .collect()}
    assert got == want


def test_stream_ivm_replay_skipped(spark, tmp_path):
    from api_to_amt_data_lake_spark.streaming.ivm import (
        fold_agg_batch,
        read_agg_state,
    )

    from decimal import Decimal

    ch = spark.createDataFrame(
        [(1, "insert", "a", Decimal("5.00"), None, None)],
        "id long, _change_type string, g string, x decimal(18,2), "
        "_old_g string, _old_x decimal(18,2)")
    root = str(tmp_path / "state")
    assert fold_agg_batch(spark, ch, 0, root, ["g"], ["x"])
    assert not fold_agg_batch(spark, ch, 0, root, ["g"], ["x"])
    [r] = read_agg_state(spark, root).collect()
    assert (r.g, r.n_rows, float(r.sum_x)) == ("a", 1, 5.0)


def test_stream_binned_counts_watermark_close(spark, tmp_path):
    """Tumbling-window histogram stream (streaming/drift.py::
    stream_binned_counts): only windows the terminal event-time
    watermark has passed are emitted, counts land in the right bins,
    and out-of-range values clamp into the top bin.

    Fixture: hourly values at 00:30 (v=5), 01:30 (v=95 → clamps), and
    03:30 (v=50, advances the watermark). With a 1 h watermark the
    terminal watermark is 02:30, so windows [00:00,01:00) and
    [01:00,02:00) close; [03:00,04:00) (end 04:00 > 02:30) must NOT."""
    import datetime as dt

    import pyspark.sql.functions as F

    from api_to_amt_data_lake_spark.streaming.drift import (
        stream_binned_counts,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(minutes=30), 5.0),
        (base + dt.timedelta(minutes=90), 95.0),
        (base + dt.timedelta(minutes=210), 50.0),
    ]
    src = tmp_path / "psisrc"
    src.mkdir()
    spark.createDataFrame(rows, "ts timestamp, value double") \
        .coalesce(1).write.parquet(str(src / "b0"))

    stream = (spark.readStream.schema("ts timestamp, value double")
              .parquet(str(src / "b*")))
    # reference max 80 → width 8 → bins: 5→0, 95→11 clamps to 9, 50→6
    width = spark.createDataFrame([(8.0,)], "_w double")
    out = stream_binned_counts(stream, width, bins=10,
                               window="1 hour", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("psi_bins_t")
         .option("checkpointLocation", str(tmp_path / "psickpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = {(r.window_start.hour, r.bin): r.n_cur for r in
           spark.sql("SELECT * FROM psi_bins_t").collect()}
    assert got == {(0, 0): 1, (1, 9): 1}  # hour-3 window stays open


def test_stream_value_counts_watermark_close(spark, tmp_path):
    """Unbinned windowed value counts (streaming/drift.py::
    stream_value_counts): per-(window, value) counts emit only for
    watermark-closed windows, values stay EXACT (no binning).

    Fixture: 00:10 (v=7), 00:40 (v=7), 00:50 (v=9), 03:30 (v=1,
    advances the watermark to 02:30 with a 1 h watermark) — the
    [00:00,01:00) window closes with counts {7: 2, 9: 1}; the hour-3
    window stays open."""
    import datetime as dt

    from api_to_amt_data_lake_spark.streaming.drift import (
        stream_value_counts,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(minutes=10), 7.0),
        (base + dt.timedelta(minutes=40), 7.0),
        (base + dt.timedelta(minutes=50), 9.0),
        (base + dt.timedelta(minutes=210), 1.0),
    ]
    src = tmp_path / "kssrc"
    src.mkdir()
    spark.createDataFrame(rows, "ts timestamp, value double") \
        .coalesce(1).write.parquet(str(src / "b0"))

    stream = (spark.readStream.schema("ts timestamp, value double")
              .parquet(str(src / "b*")))
    out = stream_value_counts(stream, window="1 hour",
                              watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("ks_vals_t")
         .option("checkpointLocation", str(tmp_path / "ksckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = {(r.window_start.hour, r.value): r.n_cur for r in
           spark.sql("SELECT * FROM ks_vals_t").collect()}
    assert got == {(0, 7.0): 2, (0, 9.0): 1}


def test_scoped_stream_state_partitions(spark, tmp_path):
    """The state-partition scope (streaming/tuning.py): the stream's
    sink contents are identical at any width, and the session's
    shuffle-partition conf is restored afterwards — including when the
    body raises."""
    import datetime as dt

    import pytest

    from api_to_amt_data_lake_spark.streaming.drift import (
        stream_value_counts,
    )
    from api_to_amt_data_lake_spark.streaming.tuning import (
        scoped_stream_state_partitions,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(minutes=10), 7.0),
        (base + dt.timedelta(minutes=40), 7.0),
        (base + dt.timedelta(minutes=50), 9.0),
        (base + dt.timedelta(minutes=210), 1.0),
    ]
    src = tmp_path / "spsrc"
    src.mkdir()
    spark.createDataFrame(rows, "ts timestamp, value double") \
        .coalesce(1).write.parquet(str(src / "b0"))

    before = spark.conf.get("spark.sql.shuffle.partitions")

    def run(qname: str, width: int) -> dict:
        stream = (spark.readStream.schema("ts timestamp, value double")
                  .parquet(str(src / "b*")))
        out = stream_value_counts(stream, window="1 hour",
                                  watermark="1 hour")
        with scoped_stream_state_partitions(spark, width) as n:
            assert n == width
            assert spark.conf.get(
                "spark.sql.shuffle.partitions") == str(width)
            q = (out.writeStream.format("memory").queryName(qname)
                 .option("checkpointLocation",
                         str(tmp_path / f"ckpt_{qname}"))
                 .outputMode("append")
                 .trigger(availableNow=True).start())
            q.awaitTermination(300)
        return {(r.window_start.hour, r.value): r.n_cur for r in
                spark.sql(f"SELECT * FROM {qname}").collect()}

    got2 = run("sp_t_w2", 2)
    got5 = run("sp_t_w5", 5)
    assert got2 == got5 == {(0, 7.0): 2, (0, 9.0): 1}
    assert spark.conf.get("spark.sql.shuffle.partitions") == before

    with pytest.raises(RuntimeError):
        with scoped_stream_state_partitions(spark, 3):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
