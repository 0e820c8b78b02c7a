from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from desdb_spark.session import get_spark, load_tables  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # 8g heap: the session-scoped fixture accumulates pinned
    # localCheckpoint blocks across ~640 tests (checkpointed RDDs cannot
    # be evicted — they ARE the truncated lineage), and at the default
    # 1g a later test's 32-way shuffle dies with UNABLE_TO_ACQUIRE_MEMORY
    # (seen r11 when dup_edges gained its candidate checkpoint). The
    # production analogue is sizing executor memory for reliable
    # checkpoint retention, not an engine knob.
    s = get_spark(
        "pytest",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "8g"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_DIR)
