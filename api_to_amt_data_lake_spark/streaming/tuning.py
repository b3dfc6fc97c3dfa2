"""Streaming state-partition scoping (guide §2.3: partitioning must be
sized to what a stage actually carries, not inherited from a constant
tuned for data-sized batch shuffles).

A stateful streaming aggregation fixes its state-store partition count
at FIRST start from ``spark.sql.shuffle.partitions`` (AQE is disabled
for stateful workloads, so nothing ever coalesces it afterwards). For
the windowed-histogram operators here — `streaming/drift.py::
stream_binned_counts` / `stream_value_counts` — state is bounded by
design at O(open windows × bins-or-distinct-values): thousands of rows
however large the input volume, because the map-side partial
aggregation collapses each micro-batch before the state exchange.
Running such a query at the session's data-shuffle width multiplies
pure per-batch overhead (one state-store instance, commit and
checkpoint file per partition per micro-batch) with no parallelism to
gain — measured at sf0.1: the identical availableNow run takes 2.4 s
at 32 partitions vs 1.1 s at 4 (same rows, same batches).

The width is a CONF (``spark.api_to_amt.stream.statePartitions``,
default 8), not a constant: deployments whose state genuinely scales
(millions of open windows, high-cardinality keys) raise it per the
state-size bound of their operator, exactly like choosing
``numPartitions`` for any other keyed store. The scope restores the
session value on exit, so batch plans built afterwards are untouched.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

STATE_PARTITIONS_CONF = "spark.api_to_amt.stream.statePartitions"
_DEFAULT_STATE_PARTITIONS = 8


@contextmanager
def scoped_stream_state_partitions(
    spark: SparkSession, n: int | None = None,
) -> Iterator[int]:
    """Scope ``spark.sql.shuffle.partitions`` to the streaming state
    width for the duration of a stream's start→awaitTermination. The
    partition count only sets state-store parallelism — per-key hash
    aggregation results are partitioning-independent, so sink contents
    are bit-identical at any width. Yields the width chosen."""
    if n is None:
        n = int(spark.conf.get(STATE_PARTITIONS_CONF,
                               str(_DEFAULT_STATE_PARTITIONS)))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
