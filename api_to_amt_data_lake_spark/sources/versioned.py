"""Shared versioned-directory + batch-marker primitives.

One definition of "a complete version" and "the last applied batch"
for every store that uses the write-next-version + prune pattern
(`sources/incremental.py`, `sources/bucket_store.py`,
`streaming/scd.py`, `streaming/sink.py`, `streaming/ann.py`) — the
completeness rule (a `v{N}` directory containing `_SUCCESS`) and the
atomic marker write are crash-recovery invariants, so they must not
drift between copies.
"""

from __future__ import annotations

import os
import re

VERSION_RE = re.compile(r"^v(\d+)$")


def complete_versions(base: str) -> list[int]:
    """Ascending ids of the COMPLETE versions under `base`: a `v{N}`
    directory counts only once its `_SUCCESS` exists, so readers never
    see a partially written (or tmp-named) version."""
    if not os.path.isdir(base):
        return []
    return sorted(
        int(m.group(1)) for d in os.listdir(base)
        if (m := VERSION_RE.match(d))
        and os.path.exists(os.path.join(base, d, "_SUCCESS")))


def read_marker(path: str, default: int = -1) -> int:
    """The batch id recorded at `path`, or `default` before any."""
    try:
        with open(path) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return default


def write_marker(path: str, value: int) -> None:
    """Atomically record a batch id (tmp + rename): a crash mid-write
    never corrupts the marker, so replay detection stays sound."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(value))
    os.replace(tmp, path)
