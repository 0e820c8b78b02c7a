"""Sorts, top-k, and set operations (SURVEY.md §2B sorts/limits/set ops).

Reference parity: ordered formatted output is desdb's ``quickWrite`` path
[desdb:desdb.py — SURVEY.md §2A A2]; set shapes come through the arbitrary
SQL surface (A1).

Scale notes: ``orderBy().limit(k)`` compiles to ``TakeOrderedAndProject`` —
a per-partition heap + driver merge, O(k) memory, no global sort. Global
sorts use range partitioning (sampled bounds), which is the scalable plan.
Determinism: every LIMIT carries a total tie-break order (SURVEY.md §5.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "sort_multi_key",
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal
        FROM customer
        ORDER BY c_mktsegment ASC, c_acctbal DESC NULLS LAST, c_custkey
    """,
    group="sorts_sets",
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column asc/desc sort with explicit NULLS placement."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_mktsegment", "c_acctbal").orderBy(
        F.col("c_mktsegment").asc(),
        F.col("c_acctbal").desc_nulls_last(),
        F.col("c_custkey").asc(),
    )


@register(
    "topk_limit",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    group="sorts_sets",
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 by totalprice; o_orderkey tie-break makes the set total-ordered."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "set_union_all",
    oracle="""
        SELECT c_custkey, c_mktsegment, 'bld' AS tag FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT c_custkey, c_mktsegment, 'mch' AS tag FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
    group="sorts_sets",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two filtered subsets, tagged by branch."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    a = c.where(F.col("c_mktsegment") == "BUILDING").withColumn("tag", F.lit("bld"))
    b = c.where(F.col("c_mktsegment") == "MACHINERY").withColumn("tag", F.lit("mch"))
    return a.unionByName(b)


@register(
    "set_intersect",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    group="sorts_sets",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of the two key sets."""
    o = load_table(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)


@register(
    "set_except",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    group="sorts_sets",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers with finished but no open orders.

    (customer-minus-orders would be the desdb shape, but every fixture
    customer has orders at sf0.01 — this variant keeps the check
    non-degenerate.)
    """
    o = load_table(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.subtract(op)
