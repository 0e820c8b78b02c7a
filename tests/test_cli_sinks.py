"""CLI (A11) and formatted stdout writers (A2)."""

from __future__ import annotations

import io
import os
import subprocess
import sys

from desdb_spark.sources.sinks import write_stream_stdout
from tests.conftest import SF_DIR

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_stdout_writer_formats(spark, tables):
    df = tables["region"]
    for fmt, first in [
        ("csv", "r_regionkey,r_name"),
        ("tsv", "r_regionkey\tr_name"),
        ("space", "r_regionkey r_name"),
    ]:
        buf = io.StringIO()
        n = write_stream_stdout(df, fmt, out=buf)
        lines = buf.getvalue().splitlines()
        assert n == 5
        assert lines[0] == first
        assert len(lines) == 6

    buf = io.StringIO()
    n = write_stream_stdout(df, "json", out=buf)
    import json

    rows = [json.loads(ln) for ln in buf.getvalue().splitlines()]
    assert n == 5 and len(rows) == 5
    assert {"r_regionkey", "r_name"} == set(rows[0])


def test_cli_query_subprocess():
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "desdb_spark.cli",
            "-q",
            "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey LIMIT 2",
            "--sf",
            SF_DIR,
        ],
        capture_output=True,
        text=True,
        timeout=180,
        cwd=REPO_ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.strip().splitlines()
    assert lines[0] == "r_regionkey,r_name"
    assert len(lines) == 3


def test_cli_empty_query_errors():
    out = subprocess.run(
        [sys.executable, "-m", "desdb_spark.cli"],
        input="",
        capture_output=True,
        text=True,
        timeout=60,
        cwd=REPO_ROOT,
    )
    assert out.returncode == 2


def test_partitioned_sink_prunes_partitions(spark):
    """The partitioned write→read op must plan real partition pruning:
    the event_type IN filter resolves against directory names, so only
    2 of 5 partition directories are scanned (the 100 TB pattern for
    bounded-cardinality partition columns)."""
    from desdb_spark.extensions.pipeline_analytics import sink_partitioned_parquet

    df = sink_partitioned_parquet(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    assert "click" in plan and "purchase" in plan, plan
    # The pruned scan must not carry a post-scan row filter on event_type
    # (pruning happens at file listing, not per row).
    rows = {r.event_type for r in df.collect()}
    assert rows == {"click", "purchase"}
