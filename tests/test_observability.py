"""df.observe op: the metrics must ride the observed plan (CollectMetrics
node), not a second job, and equal a direct aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.operators.observability import scan_observed_metrics
from tests.conftest import SF_DIR


def test_observe_plan_has_collect_metrics_node(spark, tables):
    from pyspark.sql import Observation

    o = tables["orders"].where(F.col("o_orderpriority") == "1-URGENT")
    obs = Observation("audit_probe")
    observed = o.observe(obs, F.count(F.lit(1)).alias("n"))
    plan = observed._jdf.queryExecution().analyzed().toString()
    assert "CollectMetrics" in plan, plan


def test_observed_metrics_equal_direct_aggregate(spark, tables):
    (got,) = scan_observed_metrics(spark, SF_DIR).collect()
    want = (
        tables["orders"]
        .where(F.col("o_orderpriority") == "1-URGENT")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").isNull().cast("bigint")).alias("nulls"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("s"),
            F.max(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("m"),
        )
        .first()
    )
    assert (got.n_rows, got.null_prices, got.sum_cents, got.max_cents) == (
        want.n,
        want.nulls,
        want.s,
        want.m,
    )
