"""Compaction: the layout must actually collapse (file count drops to
the size-target arithmetic) and the rewrite must be shuffle-free."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from desdb_spark.sources import compaction
from desdb_spark.sources.sinks import _stage_dir
from tests.conftest import SF_DIR


def test_compaction_collapses_file_count_losslessly(spark, tables):
    (row,) = compaction.sink_compact_small_files(spark, SF_DIR).collect()
    li = tables["lineitem"]
    assert row.n_rows == li.count()
    assert row.n_orders == li.select("l_orderkey").distinct().count()

    frag = _stage_dir(spark, "compact_fragmented")
    out = _stage_dir(spark, "compact_output")
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    n_out = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_frag == compaction.FRAGMENT_PARTS
    total = sum(
        os.path.getsize(os.path.join(frag, f))
        for f in os.listdir(frag)
        if f.endswith(".parquet")
    )
    want = max(1, math.ceil(total / compaction.TARGET_FILE_BYTES))
    assert n_out == want
    assert n_out < n_frag  # the pathology actually improved


def test_compaction_plan_is_shuffle_free(spark):
    """coalesce must not introduce an exchange: the compacting write's
    plan reads splits and concatenates them."""
    frag = _stage_dir(spark, "compact_fragmented")
    if not os.path.isdir(frag):  # run the op once to stage
        compaction.sink_compact_small_files(spark, SF_DIR).collect()
    df = spark.read.parquet(frag).coalesce(2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert df.count() > 0
