from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from api_to_amt_data_lake_spark.session import get_spark  # noqa: E402


# Slow-tier auto-marking (see pytest.ini): tests measured >= 3 s per
# call in the round-12 full-suite gate run are listed (one nodeid per
# line, relative to tests/) in slow_tests.txt and marked `slow` here,
# so the default `-m "not slow"` tier stays inside the driver's
# verification window. A nodeid that stops existing is simply ignored
# (renamed/removed tests never break collection).
_SLOW_FILE = Path(__file__).resolve().parent / "slow_tests.txt"
_SLOW_IDS = frozenset(
    ln.strip() for ln in _SLOW_FILE.read_text().splitlines() if ln.strip()
) if _SLOW_FILE.is_file() else frozenset()


def pytest_collection_modifyitems(config, items):
    for item in items:
        # item.nodeid is "tests/<file>::<test>[param]" from the repo
        # root or "<file>::<test>[param]" when invoked inside tests/.
        nid = item.nodeid
        if nid.startswith("tests/"):
            nid = nid[len("tests/"):]
        if nid in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
