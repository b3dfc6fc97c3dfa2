"""Scoped reliable-checkpoint configuration for iterative operators.

`SparkContext.setCheckpointDir` is SESSION-GLOBAL state: an operator
that sets it and returns silently redirects every later `checkpoint()`
in the application (ADVICE r9 — `bpe_train` could re-point
`connected_components`' checkpoints at its own directory). Operators
whose reliable checkpoints are all EAGER — fully materialized before
the operator returns — scope the mutation with
`scoped_checkpoint_dir`, which restores the previous directory (or the
unset state) on exit. Operators that checkpoint LAZILY
(`checkpoint(eager=False)` — the files materialize at the caller's
first action, after the operator returned) cannot restore without
breaking their own checkpoints; those keep the plain set and document
the global side effect in their `checkpoint_dir` parameter docs.
"""

from __future__ import annotations

import contextlib
from collections.abc import Iterator

from pyspark.sql import SparkSession


@contextlib.contextmanager
def scoped_checkpoint_dir(spark: SparkSession,
                          checkpoint_dir: str | None) -> Iterator[None]:
    """Set the context's checkpoint dir for the duration of the block,
    restoring the previous value (or the unset state —
    `setCheckpointDir(None)` maps to Scala's `Option(null)`) on exit.
    No-op when `checkpoint_dir` is None. Only correct around EAGER
    checkpoints; see the module docstring."""
    if checkpoint_dir is None:
        yield
        return
    sc = spark.sparkContext
    prev = sc.getCheckpointDir()
    sc.setCheckpointDir(checkpoint_dir)
    try:
        yield
    finally:
        sc.setCheckpointDir(prev)
