"""Round-6 batch-21 drawdown and ABC classification.

- Maximum drawdown: the largest peak-to-trough fall of a cumulative
  series — the risk metric for revenue/throughput trends, and the
  canonical running-max-window exercise (drawdown at t = running max −
  value; the answer is its max).
- ABC classification: Pareto classes over customers by revenue share
  (A = first 80% of cumulative revenue, B = to 95%, C = the tail) —
  the inventory-analytics cut that complements the Gini/top-share
  concentration op with actionable buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "window_max_drawdown",
    oracle="""
        WITH daily AS (
            SELECT o_orderdate AS d,
                   CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS rev_cents
            FROM orders GROUP BY o_orderdate
        ), cum AS (
            SELECT d, sum(rev_cents) OVER (ORDER BY d) AS c
            FROM daily
        ), dd AS (
            SELECT d, c,
                   max(c) OVER (ORDER BY d) - c AS drawdown
            FROM cum
        )
        SELECT d, CAST(c AS BIGINT) AS cum_cents,
               CAST(drawdown AS BIGINT) AS drawdown_cents
        FROM dd
        ORDER BY drawdown DESC, d LIMIT 10
    """,
    group="analytics_ext5",
)
def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10 deepest drawdown days of cumulative daily revenue:
    drawdown(t) = running-max(cum) − cum, in exact cents (a revenue
    series only ever has drawdown 0 when every day is positive — the
    fixture's negative-free series makes this a monotone-check too; on
    a net-of-refunds series the metric is the headline risk number).

    Scale shape: daily cents aggregate (map-side combinable), then two
    stacked windows over the calendar-sized series sharing one sort —
    Catalyst evaluates running sum and running max in a single Window
    node. Integer cents end to end.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    wd = W.orderBy("d")
    cum = daily.select("d", F.sum("rev_cents").over(wd).alias("c"))
    dd = cum.select(
        "d",
        F.col("c").cast("bigint").alias("cum_cents"),
        (F.max("c").over(wd) - F.col("c")).cast("bigint").alias("drawdown_cents"),
    )
    return dd.orderBy(F.desc("drawdown_cents"), "d").limit(10)


@register(
    "analytics_abc_classes",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS rev
            FROM orders GROUP BY o_custkey
        ), ranked AS (
            SELECT rev,
                   sum(rev) OVER (ORDER BY rev DESC, o_custkey) AS crev,
                   sum(rev) OVER () AS total
            FROM per_cust
        ), classed AS (
            SELECT rev,
                   CASE WHEN crev <= total * CAST(0.8 AS DOUBLE) THEN 'A'
                        WHEN crev <= total * CAST(0.95 AS DOUBLE) THEN 'B'
                        ELSE 'C' END AS abc
            FROM ranked
        )
        SELECT abc,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(rev) AS BIGINT) AS rev_cents,
               round(CAST(sum(rev) AS DOUBLE) / max(total) , 6) AS rev_share
        FROM classed, (SELECT sum(rev) AS total FROM per_cust) t
        GROUP BY abc
    """,
    group="analytics_ext5",
)
def analytics_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto classes over customers: ranked by revenue descending
    (custkey tie-break), class A holds the customers inside the first
    80% of cumulative revenue, B to 95%, C the tail; reported as
    customer count, exact cents, and revenue share per class.

    Scale shape: the rank runs over the per-customer AGGREGATE
    (customer cardinality, one sort), cumulative and total windows
    share its partitioning, and classification is a row-local CASE.
    The boundary comparison is deterministic cross-engine because BOTH
    sides multiply in binary64: Spark's ``total * 0.8`` is a double
    product, and the oracle spells ``CAST(0.8 AS DOUBLE)`` — a bare
    ``0.8`` would make DuckDB evaluate the boundary in exact DECIMAL
    arithmetic, which can classify a cumulative-cents value landing on
    the boundary differently (the r6 DECIMAL-literal trap,
    ADVICE r6 / [[cross-engine-float-traps]]).
    """
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    wr = W.orderBy(F.desc("rev"), "o_custkey")
    wall = W.partitionBy()
    ranked = per_cust.select(
        "rev",
        F.sum("rev").over(wr).alias("crev"),
        F.sum("rev").over(wall).alias("total"),
    )
    abc = (
        F.when(F.col("crev") <= F.col("total") * 0.8, "A")
        .when(F.col("crev") <= F.col("total") * 0.95, "B")
        .otherwise("C")
    )
    return (
        ranked.withColumn("abc", abc)
        .groupBy("abc")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("rev").cast("bigint").alias("rev_cents"),
            F.round(
                F.sum("rev").cast("double") / F.max("total"), 6
            ).alias("rev_share"),
        )
    )
