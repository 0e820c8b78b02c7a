"""Storage-layout semantics for lake_ext: dynamic partition pruning must
actually appear in the physical plan, and the sorted sink must produce
disjoint, internally-sorted files."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.sources import lake_ext
from desdb_spark.sources.sinks import sink_sorted_parquet
from tests.conftest import SF_DIR


def test_partition_pruned_scan_uses_dpp(spark):
    df = lake_ext.join_partition_pruned_scan(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    # and the pruning lands on the partition column of the scan
    assert "ts_day" in plan
    assert df.count() > 0


def test_sorted_sink_files_disjoint_and_sorted(spark):
    (roundtrip,) = sink_sorted_parquet(spark, SF_DIR).collect()
    assert roundtrip.n_rows > 0 and roundtrip.min_price <= roundtrip.max_price
    profile = lake_ext.sorted_layout_profile(spark).collect()
    assert len(profile) >= 2  # range partitioning produced multiple files
    # disjoint, ordered ranges
    for prev, cur in zip(profile, profile[1:]):
        assert prev.max_price <= cur.min_price
    # spot-check in-file sortedness via the written data itself
    from desdb_spark.sources.sinks import _stage_dir

    out = _stage_dir(spark, "lake_sorted_orders")
    one = (
        spark.read.parquet(out)
        .withColumn("file", F.input_file_name())
        .withColumn("part", F.spark_partition_id())
    )
    # within each parquet file, rows must come back already ordered
    import pandas as pd  # noqa: F401

    pdf = one.select("file", "o_totalprice").toPandas()
    for _, grp in pdf.groupby("file"):
        vals = grp["o_totalprice"].tolist()
        assert vals == sorted(vals)
