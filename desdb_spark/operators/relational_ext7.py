"""Relational surface extensions, round 5 (SURVEY.md §2B A1 passthrough
breadth): FILTER-clause aggregates, per-group top-k, keyset pagination, and
a time-hierarchy rollup. Each is a query shape a desdb user could ship
through ``Connection.quick(sql)`` [desdb:desdb.py — reconstructed, SURVEY.md
§0] that the engine must plan well at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "agg_filter_clause",
    oracle="""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 4)
                   AS open_value,
               round(avg(o_totalprice) FILTER (WHERE o_totalprice > 100000), 4)
                   AS avg_large
        FROM orders
        GROUP BY o_orderpriority
    """,
    group="relational_ext7",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates (SQL ``FILTER (WHERE ...)``): several
    differently-filtered measures from ONE pass over the fact table.

    Scale shape: a single hash aggregate — the conditional masks are
    ``when`` expressions evaluated inside the partial aggregate, so the
    fact table is scanned once and shuffled once on the (few-valued)
    group key, instead of one scan per filtered measure. ``avg_large``
    is null for groups with no qualifying rows in both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    finished = F.when(F.col("o_orderstatus") == "F", 1)
    open_val = F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))
    large = F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice"))
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.count(finished).alias("n_finished"),
        F.round(F.sum(open_val), 4).alias("open_value"),
        F.round(F.avg(large), 4).alias("avg_large"),
    )


@register(
    "topk_per_group",
    oracle="""
        SELECT o_orderpriority, o_orderkey, o_totalprice, rk
        FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
            FROM orders)
        WHERE rk <= 3
    """,
    group="relational_ext7",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by value per priority class — the per-group twin of
    the global ``topk_limit``.

    Scale shape: one shuffle on the group key, then a rank + filter.
    Spark plans this as WindowGroupLimit (rank pushdown): each map task
    keeps only its local top-3 per group before the exchange, so the
    shuffle carries O(groups × k) rows, not the whole fact table. Total
    tie-break (o_orderkey) keeps the rank deterministic in both engines
    (SURVEY.md §5.3).
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.select("o_orderpriority", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 3)
    )


@register(
    "sort_offset_page",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 50 OFFSET 100
    """,
    group="relational_ext7",
)
def sort_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: page 3 of a value-ranked order listing (LIMIT 50
    OFFSET 100) — the result-browsing shape every catalog UI issues.

    Scale shape: ``offset(n).limit(k)`` folds into one global
    TakeOrderedAndProject of the first n+k rows (each partition
    contributes its local top-(n+k), the driver merges) — no global
    sort, no full-table shuffle. Deep pagination (offset ≫ 10⁴) should
    switch to keyset predicates (`WHERE price < last_seen`) instead;
    this op models the shallow-page fast path. Total tie-break order
    makes the page contents deterministic (SURVEY.md §5.3).
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(100)
        .limit(50)
    )


@register(
    "rollup_time_hierarchy",
    oracle="""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mon,
               count(*) AS n_orders,
               round(sum(o_totalprice), 4) AS revenue
        FROM orders
        GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))
    """,
    group="relational_ext7",
)
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-hierarchy rollup: revenue by (year, month), with yearly
    subtotals and a grand total — the time-dimension variant of
    ``agg_rollup`` (which rolls up categorical keys).

    Scale shape: ROLLUP expands to grouping sets inside ONE hash
    aggregate (Expand + partial agg before the exchange) — the fact
    table is scanned and shuffled once; subtotal rows are produced by
    the aggregate itself, not by re-reading. Key cardinality is tiny
    (years × months), so the shuffle cannot skew.
    """
    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate").cast("bigint")
    mon = F.month("o_orderdate").cast("bigint")
    return (
        o.select(yr.alias("yr"), mon.alias("mon"), "o_totalprice")
        .rollup("yr", "mon")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
    )
