"""Relational coverage extensions, round 4 batch 4 (SURVEY.md §2B widening).

Six more canned analytics shapes a desdb user issued as literal SQL through
``Connection.quick()`` [desdb:desdb.py quick — reconstructed, SURVEY.md §0 /
§2A A1]: the TPC-H Q13/Q15 decision-support shapes adapted to the fixture
schema, a fixed-width histogram, a per-group mode, month-over-month growth,
and an RFM customer segmentation.

All pure built-in expression work, no UDFs. Determinism per SURVEY.md §5.3:
floats rounded in both engines BEFORE any comparison or ranking that depends
on them (Q15 takes max over the rounded revenue; growth pct derives from the
rounded monthly revenue), every ranking carries a total tie-break, and no
gratuitous top-level sorts (driver hash is order-insensitive).

Scale notes common to the module: SF-linear tables (customer, supplier,
part, orders, lineitem) carry no broadcast hints — AQE decides at fixture
scale and falls back to shuffle joins at 100 TB (ADVICE r3). Global scalar
thresholds are declared as SQL scalar subqueries so Catalyst plans a
``ScalarSubquery`` (a constant-key equi-join would constant-fold into the
BNLJ the fleet plan audit forbids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "tpch_q13_custdist",
    oracle="""
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (SELECT c_custkey,
                     CAST(count(o_orderkey) AS BIGINT) AS c_count
              FROM customer
              LEFT JOIN orders
                ON c_custkey = o_custkey
               AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey) per_cust
        GROUP BY c_count
    """,
    group="relational_ext4",
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — a left outer
    join with an extra join-side predicate, then a double aggregation
    (orders per customer, customers per order-count).

    Scale shape: the priority predicate filters orders BEFORE the join
    (it lives in the join condition, not a post-filter, so customers with
    only urgent orders still appear with count 0). The outer join and the
    first groupBy both hash on custkey, so Catalyst reuses one exchange;
    the second groupBy collapses to ~tens of distinct counts — a map-side
    partial agg with a tiny shuffle. No broadcast hint: customer is
    SF-linear (ADVICE r3).
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                                   "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle="""
        WITH rev AS (
          SELECT l_suppkey,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_rev
        FROM supplier
        JOIN rev ON s_suppkey = l_suppkey
        WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
    group="relational_ext4",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top supplier(s) by quarterly revenue — a grouped
    revenue view consumed twice, once for the global max (uncorrelated
    scalar subquery) and once to surface the winners.

    Scale shape: declared as SQL so the max runs as a ``ScalarSubquery``
    (its own tiny job, inlined as a literal — no join), avoiding both a
    global window (single-partition sort) and a constant-key join (BNLJ).
    The revenue CTE aggregates lineitem once per consumer with the
    ship-date quarter pushed to the scan; max is taken over the ROUNDED
    revenue so the equality filter is bitwise-stable in both engines.
    Supplier joins only the 1-row-per-supplier aggregate, never raw
    lineitem.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q15_lineitem")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("q15_supplier")
    return spark.sql(
        """
        WITH rev AS (
          SELECT l_suppkey,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
          FROM q15_lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_rev
        FROM q15_supplier
        JOIN rev ON s_suppkey = l_suppkey
        WHERE total_rev = (SELECT max(total_rev) FROM rev)
        """
    )


@register(
    "agg_histogram_bins",
    oracle="""
        SELECT CAST(least(floor(o_totalprice / 50000.0), 9) AS BIGINT)
                   AS bucket,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(avg(o_totalprice), 2) AS avg_price,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price
        FROM orders
        GROUP BY 1
    """,
    group="relational_ext4",
)
def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram of order totals: 50 k-wide buckets with
    an open top bucket, plus per-bucket summary stats — the profiling
    query behind every dashboard distribution widget.

    Scale shape: the bucket id is a pure projection (floor + least), so
    the whole histogram is one map-side partial agg over ≤10 groups —
    the shuffle ships ten rows per task regardless of table size, and
    ReadSchema carries exactly one column. No sort: bucket id is the key,
    order-insensitive downstream.
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(9)).cast(
        "long"
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@register(
    "agg_mode_per_group",
    oracle="""
        SELECT l_returnflag, p_brand, n_lines
        FROM (SELECT l_returnflag, p_brand,
                     CAST(count(*) AS BIGINT) AS n_lines,
                     row_number() OVER (PARTITION BY l_returnflag
                                        ORDER BY count(*) DESC, p_brand) AS rk
              FROM lineitem JOIN part ON l_partkey = p_partkey
              GROUP BY l_returnflag, p_brand) ranked
        WHERE rk = 1
    """,
    group="relational_ext4",
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a deterministic tie-break: the most frequent
    part brand within each return flag. Built as count + row_number
    rather than the ``mode()`` aggregate because SQL engines break mode
    ties arbitrarily — (count DESC, brand ASC) is total, so both engines
    agree bitwise [SURVEY.md §5.3].

    Scale shape: lineitem⋈part shuffles on partkey (both SF-linear, no
    hint — AQE decides); the (flag, brand) groupBy partial-aggregates
    map-side to ≤ 3×|brands| rows, and the ranking window partitions by
    flag over that tiny aggregate — the window never sees fact-table
    cardinality.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    counts = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_returnflag", "p_brand")
        .agg(F.count("*").alias("n_lines"))
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n_lines").desc(), F.col("p_brand")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("l_returnflag", "p_brand", "n_lines")
    )


@register(
    "window_monthly_growth",
    oracle="""
        WITH monthly AS (
          SELECT date_trunc('month', o_orderdate) AS month,
                 round(sum(o_totalprice), 2) AS revenue,
                 CAST(count(*) AS BIGINT) AS n_orders
          FROM orders
          GROUP BY 1)
        SELECT month, revenue, n_orders,
               round(revenue - lag(revenue) OVER (ORDER BY month), 2)
                   AS rev_delta,
               round((revenue - lag(revenue) OVER (ORDER BY month))
                     / lag(revenue) OVER (ORDER BY month), 6) AS rev_growth
        FROM monthly
    """,
    group="relational_ext4",
)
def window_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: calendar-month rollup, then lag()
    deltas and growth ratio — the canonical trend query.

    Scale shape: the groupBy collapses the fact table to ~80 month rows
    BEFORE the unpartitioned lag window touches anything, so the
    single-partition window sort is over dozens of rows, not the table
    (windows over raw facts always partition — see
    window_time_range_rolling). Growth derives from the ROUNDED monthly
    revenue so both engines rank and subtract identical doubles; the
    first month's lag is NULL in both.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        "n_orders",
        F.round(F.col("revenue") - prev, 2).alias("rev_delta"),
        F.round((F.col("revenue") - prev) / prev, 6).alias("rev_growth"),
    )


@register(
    "analytics_rfm_segments",
    oracle="""
        WITH per_cust AS (
          SELECT o_custkey,
                 datediff('day', max(o_orderdate),
                          TIMESTAMP '2001-09-01') AS recency_days,
                 CAST(count(*) AS BIGINT) AS frequency,
                 round(sum(o_totalprice), 2) AS monetary
          FROM orders
          GROUP BY o_custkey)
        SELECT concat(CASE WHEN recency_days <= 365 THEN 'R1' ELSE 'R0' END,
                      CASE WHEN frequency >= 12 THEN 'F1' ELSE 'F0' END,
                      CASE WHEN monetary >= 1500000.0 THEN 'M1' ELSE 'M0' END)
                   AS segment,
               CAST(count(*) AS BIGINT) AS n_cust,
               floor(sum(CAST(round(monetary * 100, 0) AS BIGINT)) * 1.0
                     / count(*)) / 100.0 AS avg_monetary,
               round(sum(monetary), 2) AS total_monetary
        FROM per_cust
        GROUP BY 1
    """,
    group="relational_ext4",
)
def analytics_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency / frequency / monetary flags at
    fixed business thresholds, rolled up to segment-level counts and
    value. Fixed thresholds (not data-driven quantiles) keep the op a
    single groupBy chain — the quantile variant would use
    ``approx_percentile`` thresholds at scale, trading exactness for the
    same shape.

    Scale shape: one shuffle on custkey for the per-customer aggregate
    (map-side partial first), then a pure projection into ≤8 segments and
    a second tiny aggregate. No window, no global sort, no join. The
    monetary sum is rounded before both the threshold test and the
    segment rollup, so flag membership is bitwise-identical in both
    engines. The segment average is computed as floor of integer cents
    (not round(avg)): a real fixture segment lands on an exact half-cent
    (194 469 371.31 / 58 = ….195), where HALF_UP (Spark) and DuckDB
    disagree — floor over integer cents is boundary-free.
    """
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2001-09-01").cast("timestamp"), F.max("o_orderdate")
        ).alias("recency_days"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    segment = F.concat(
        F.when(F.col("recency_days") <= 365, "R1").otherwise("R0"),
        F.when(F.col("frequency") >= 12, "F1").otherwise("F0"),
        F.when(F.col("monetary") >= 1500000.0, "M1").otherwise("M0"),
    )
    return (
        per_cust.groupBy(segment.alias("segment"))
        .agg(
            F.count("*").alias("n_cust"),
            (
                F.floor(
                    F.sum(F.round(F.col("monetary") * 100, 0).cast("bigint"))
                    * F.lit(1.0)
                    / F.count("*")
                )
                / 100.0
            ).alias("avg_monetary"),
            F.round(F.sum("monetary"), 2).alias("total_monetary"),
        )
    )
