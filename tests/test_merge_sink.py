"""Streaming-merge structural pins: multiple micro-batch commits, and
set-to-value replay idempotency (the exactly-once-state claim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.sources.lake_dml import merge_into
from desdb_spark.sources.time_travel import read_as_of
from desdb_spark.streaming.merge_sink import latest_version, run_stream_merge
from tests.conftest import SF_DIR


def test_stream_commits_one_version_per_microbatch(spark):
    root = run_stream_merge(spark, SF_DIR)
    # v1 base + one commit per staged CDC file (maxFilesPerTrigger=1).
    assert latest_version(root) >= 3


def test_replayed_batch_is_idempotent(spark):
    root = run_stream_merge(spark, SF_DIR)
    v = latest_version(root)
    before = read_as_of(spark, root, v)
    # Re-deliver a synthetic batch twice: every row carries an absolute
    # value, so the second merge must reproduce identical content.
    batch = before.orderBy("k").limit(50).select(
        "k", (F.col("cents") + 777).alias("cents")
    )
    merge_into(spark, root, v, v + 1, batch)
    merge_into(spark, root, v + 1, v + 2, batch)
    a = read_as_of(spark, root, v + 1)
    b = read_as_of(spark, root, v + 2)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0