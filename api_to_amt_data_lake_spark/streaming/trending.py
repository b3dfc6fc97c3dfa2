"""Streaming trending scores: exponentially-decayed popularity counters
maintained incrementally across micro-batches.

The batch decayed-popularity query (conformance q99ze) re-reads the
whole event history each run; at stream rates that is O(history) per
refresh. EXPONENTIAL decay is the one family the fold can maintain
incrementally and exactly-in-math: with w(age) = 0.5^(age/half_life),

    score(T2) = score(T1) · 0.5^((T2-T1)/half_life) + Σ_new w(T2 - t)

so per-key state is two cells — (score, as_of) — and each micro-batch
costs O(batch + touched keys), never O(history). (The q99ze batch
query's 1/sqrt decay is NOT foldable — polynomial decay has no
self-similar update — which is exactly why streaming systems use
half-life counters.)

Same store discipline as `sink.py`: versioned parquet state + an
atomic batch-id replay marker, so restarts skip applied batches and a
crash between state write and marker re-folds idempotently (the fold
is deterministic given (state, batch)). Fold-vs-direct parity is exact
up to float addition order (~1 ulp); tests compare at 1e-9 relative.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.sources.versioned import (
    read_marker,
    write_marker,
)

_US_PER_S = 1_000_000.0


def decayed_scores_batch(
    events: DataFrame,
    key_cols: list[str],
    ts_us_col: str,
    ref_us: int,
    half_life_s: float,
) -> DataFrame:
    """Batch binding: (keys…, score, as_of_us) with
    score = Σ 0.5^((ref_us − t)/half_life) — the one-shot recompute the
    fold below maintains incrementally. `ts_us_col` is epoch micros
    (callers convert timestamps once; see operators/asof.py::_ts_to_num
    for the NTZ-safe conversion)."""
    hl_us = half_life_s * _US_PER_S
    wt = F.pow(F.lit(0.5),
               (F.lit(float(ref_us)) - F.col(ts_us_col)) / F.lit(hl_us))
    return (
        events.groupBy(*[F.col(k) for k in key_cols])
        .agg(F.sum(wt).alias("score"))
        .withColumn("as_of_us", F.lit(int(ref_us)))
    )


def _state_dir(root: str, version: int) -> str:
    return os.path.join(str(root), f"v{version:09d}")


def read_trending(spark: SparkSession, state_root: str) -> DataFrame:
    """Current (keys…, score, as_of_us) state, empty-safe before the
    first fold."""
    v = read_marker(os.path.join(str(state_root), "_version"))
    if v < 0:
        raise FileNotFoundError(f"no trending state under {state_root}")
    return spark.read.parquet(_state_dir(state_root, v))


def fold_trending_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_root: str,
    key_cols: list[str],
    ts_us_col: str,
    half_life_s: float,
) -> bool:
    """Fold one micro-batch of (keys…, ts_us) events into the decayed
    counters; returns False on a replayed batch id.

    The new reference time is max(state as_of, batch max ts) — state
    rows decay forward to it, batch events weigh in against it, and
    an outer join unions toucher and untouched keys (untouched keys
    only decay). One broadcast-sized scalar (the ref) plus a keyed
    outer join of state with the batch's per-key partial sums: cost is
    O(batch + |state|) rows through one shuffle, never event history.

    Crash safety: new state version written wholly under a tmp dir,
    renamed in, THEN the version + batch markers advance (atomic tmp +
    rename each); a crash between state and marker replays the fold,
    which is deterministic from (previous state, batch) — same result.
    """
    marker = os.path.join(str(state_root), "_last_batch")
    if batch_id <= read_marker(marker):
        return False
    hl_us = half_life_s * _US_PER_S
    batch_ref = batch_df.agg(F.max(ts_us_col)).first()[0]

    vmark = os.path.join(str(state_root), "_version")
    prev_v = read_marker(vmark)
    if prev_v >= 0:
        state = spark.read.parquet(_state_dir(state_root, prev_v))
        prev_as_of = state.agg(F.max("as_of_us")).first()[0]
    else:
        state = None
        prev_as_of = None

    ref = max(x for x in (batch_ref, prev_as_of) if x is not None)
    inc = (
        batch_df.groupBy(*[F.col(k) for k in key_cols])
        .agg(F.sum(
            F.pow(F.lit(0.5),
                  (F.lit(float(ref)) - F.col(ts_us_col)) / F.lit(hl_us))
        ).alias("_inc"))
    )
    if state is not None:
        decayed = state.withColumn(
            "_old",
            F.col("score") * F.pow(
                F.lit(0.5),
                (F.lit(float(ref)) - F.col("as_of_us")) / F.lit(hl_us)),
        ).select(*key_cols, "_old")
        merged = decayed.join(inc, key_cols, "full_outer").select(
            *key_cols,
            (F.coalesce(F.col("_old"), F.lit(0.0))
             + F.coalesce(F.col("_inc"), F.lit(0.0))).alias("score"),
        )
    else:
        merged = inc.select(*key_cols, F.col("_inc").alias("score"))
    out = merged.withColumn("as_of_us", F.lit(int(ref)))

    new_v = max(prev_v, -1) + 1
    final = _state_dir(state_root, new_v)
    tmp = final + "._tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    out.write.parquet(tmp)
    os.rename(tmp, final)
    write_marker(vmark, new_v)
    write_marker(marker, batch_id)
    # Keep the previous version for crash recovery, prune older.
    for d in os.listdir(state_root):
        if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < new_v - 1:
            shutil.rmtree(os.path.join(state_root, d), ignore_errors=True)
    return True


def stream_trending(
    stream_df: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    key_cols: list[str],
    ts_us_col: str,
    half_life_s: float,
    available_now: bool = True,
):
    """Start a stream folding decayed per-key popularity; returns the
    StreamingQuery. Input stream columns: key_cols + [ts_us_col]."""
    spark = stream_df.sparkSession

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_trending_batch(spark, batch_df, batch_id, state_root,
                            key_cols, ts_us_col, half_life_s)

    writer = stream_df.writeStream.foreachBatch(fold) \
        .option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
