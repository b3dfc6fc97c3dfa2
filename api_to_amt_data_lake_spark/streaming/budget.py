"""Streaming curation budget: per-source token caps enforced across
micro-batches via arbitrary stateful processing.

A training-data pipeline mixes sources under per-source token budgets
(the batch version is the curation pass's budget stage). When documents
ARRIVE AS A STREAM, the running per-source spend must survive batch
boundaries — exactly the cross-batch state a watermarked aggregation
cannot express, and the use case arbitrary-state APIs exist for: one
state cell per source key holds the tokens spent so far, each batch
admits documents (in deterministic id order) until the cap, and the
state store carries the running total to the next batch.

Implemented on `applyInPandasWithState` (GroupState), the stable
arbitrary-state API in this environment; Spark 4's
`transformWithStateInPandas` expresses the same processor as a
StatefulProcessor with a ValueState cell, but its Python state-server
protocol needs the `protobuf` package, absent from this container —
port the `fn` body into `handleInputRows` when that dependency exists.

Scale shape: state is one long per source key, partitioned by the
groupBy — no skew risk beyond the source distribution itself; Arrow
batches stream through the Python worker, nothing driver-side.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

BUDGET_OUTPUT_SCHEMA = "source string, doc_id long, n_tokens long"
_STATE_SCHEMA = "spent long"


def _budget_fn(budget: int):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
           ) -> Iterator[pd.DataFrame]:
        spent = state.get[0] if state.exists else 0
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            # Admission in ascending id order (deterministic under
            # retry); a doc that would cross the cap is dropped, later
            # smaller docs may still fit — best-effort packing, the same
            # policy as the batch curation stage.
            keep_rows = []
            for _, row in pdf.iterrows():
                n = int(row["n_tokens"])
                if spent + n <= budget:
                    keep_rows.append(row)
                    spent += n
            if keep_rows:
                yield pd.DataFrame(keep_rows)[
                    ["source", "doc_id", "n_tokens"]]
        state.update((spent,))

    return fn


def stream_budget_filter(stream_df: DataFrame,
                         budget_per_source: int) -> DataFrame:
    """Streaming per-source token-budget admission.

    Input stream columns: (source, doc_id, n_tokens); output is the
    admitted subset. State never expires (budgets are per-run); callers
    wanting daily budgets should window the source key by date instead.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream_df.groupBy("source")
        .applyInPandasWithState(
            _budget_fn(int(budget_per_source)),
            outputStructType=BUDGET_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
