"""Sequence packing: concat-and-chunk offsets for LLM training batches.

Training pipelines concatenate the curated corpus in a deterministic
order and cut it into fixed-length context windows; each document's
global token offset decides its window (bin) and whether it straddles a
boundary. The offset is a GLOBAL prefix sum — the textbook case where a
naive `Window.orderBy(id)` with no partition collapses 100 TB onto one
task. This operator computes it with the canonical two-phase distributed
prefix sum instead:

1. contiguous id-range blocks (floor(id / block)) partition the window —
   within-block running sums run fully parallel;
2. the per-block totals (one row per block — tiny) get their own prefix
   sum on a constant-key window, and broadcast-join back as each
   block's base offset.

Shuffle cost: one hash partition on block for the within-block windows,
plus a broadcast of #blocks rows. No single-partition stage ever sees
more than one block of rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(df: DataFrame, id_col: str, n_tokens: Column,
                 window_tokens: int, block: int = 1 << 20) -> DataFrame:
    """(id, n_tokens, start_offset, bin_id, crosses_boundary) under
    concat-in-id-order-and-chunk-into-`window_tokens` packing."""
    base = df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        (F.col(id_col) / block).cast("long").alias("_blk"),
    )
    w_in = (Window.partitionBy("_blk").orderBy(F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, -1))
    local = base.withColumn(
        "_local_off", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)))

    totals = base.groupBy("_blk").agg(F.sum("n_tokens").alias("_tot"))
    # Prefix-sum the per-block totals: #blocks rows — packed into one
    # row and folded (operators/smallframe.py), so no WindowExec ever
    # sees a partition-less spec.
    from api_to_amt_data_lake_spark.operators.smallframe import (
        exclusive_prefix_sums,
    )
    bases = exclusive_prefix_sums(totals, "_blk", {"_tot": "_base"})

    win = F.lit(int(window_tokens))
    off = F.col("_base") + F.col("_local_off")
    end_off = off + F.greatest(F.col("n_tokens") - 1, F.lit(0))
    return (
        local.join(F.broadcast(bases), "_blk")
        .select(
            F.col(id_col),
            "n_tokens",
            off.alias("start_offset"),
            F.floor(off / win).cast("long").alias("bin_id"),
            ((F.col("n_tokens") > 0)
             & (F.floor(off / win) != F.floor(end_off / win)))
            .alias("crosses_boundary"),
        )
    )
