"""Streaming incremental view maintenance: a CDC stream keeps a grouped
aggregate current.

`operators/delta_agg.py` proves the batch identity
fold(agg(old), cdf) == agg(new); this module runs that fold per
micro-batch over a STREAM of change rows (the shape `frame_changes(...,
include_old=True)` emits and any CDC source provides: _change_type +
new columns + _old_{c}), so a gold aggregate stays current at
O(batch + touched groups) per trigger without ever re-reading the
fact table. Same store discipline as `trending.py`: versioned parquet
state + an atomic batch-id replay marker; a replayed batch is skipped,
and a crash between state write and marker re-folds deterministically.

Exactness: sums should be DECIMAL columns (the batch contract) so the
fold's addition order cannot drift from a from-scratch aggregate —
the stream-vs-batch parity test compares EXACT equality, not
tolerance.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from api_to_amt_data_lake_spark.operators.delta_agg import (
    fold_grouped_sums,
)
from api_to_amt_data_lake_spark.sources.versioned import (
    read_marker,
    write_marker,
)


def _state_dir(root: str, version: int) -> str:
    return os.path.join(str(root), f"v{version:09d}")


def read_agg_state(spark: SparkSession, state_root: str) -> DataFrame:
    v = read_marker(os.path.join(str(state_root), "_version"))
    if v < 0:
        raise FileNotFoundError(f"no aggregate state under {state_root}")
    return spark.read.parquet(_state_dir(state_root, v))


def fold_agg_batch(
    spark: SparkSession,
    changes: DataFrame,
    batch_id: int,
    state_root: str,
    group_cols: list[str],
    sum_cols: list[str],
) -> bool:
    """Fold one micro-batch of CDF rows into the grouped-sums state;
    returns False on a replayed batch id."""
    marker = os.path.join(str(state_root), "_last_batch")
    if batch_id <= read_marker(marker):
        return False
    vmark = os.path.join(str(state_root), "_version")
    prev_v = read_marker(vmark)
    state = (spark.read.parquet(_state_dir(state_root, prev_v))
             if prev_v >= 0 else None)
    out = fold_grouped_sums(state, changes, group_cols, sum_cols)
    new_v = max(prev_v, -1) + 1
    final = _state_dir(state_root, new_v)
    tmp = final + "._tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    out.write.parquet(tmp)
    os.rename(tmp, final)
    write_marker(vmark, new_v)
    write_marker(marker, batch_id)
    for d in os.listdir(state_root):
        if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < new_v - 1:
            shutil.rmtree(os.path.join(state_root, d), ignore_errors=True)
    return True


def stream_maintain_agg(
    change_stream: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    group_cols: list[str],
    sum_cols: list[str],
    available_now: bool = True,
):
    """Start a stream folding CDC rows into the aggregate state;
    returns the StreamingQuery. Stream columns: _change_type, the
    group/sum columns, and _old_{c} for each (null on inserts)."""
    spark = change_stream.sparkSession

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_agg_batch(spark, batch_df, batch_id, state_root,
                       group_cols, sum_cols)

    writer = change_stream.writeStream.foreachBatch(fold) \
        .option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
