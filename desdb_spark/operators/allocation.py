"""Round-6 batch-17 exact proportional allocation (largest remainder).

Distributing a parent-level amount across children proportionally —
an order's discount across its lineitems, a budget across accounts —
has a constraint floats can't honor: the child allocations must sum to
the parent total EXACTLY, in cents. The standard answer is the
largest-remainder (Hamilton) method, public-domain apportionment math:
give every child ⌊share⌋ cents, then hand the leftover cents one each
to the children with the largest fractional remainders (deterministic
tie-break). Pure integer + window arithmetic — no float ever touches a
stored amount.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "alloc_largest_remainder",
    oracle="""
        WITH items AS (
            SELECT l_orderkey AS k, l_linenumber AS ln,
                   CAST(l_quantity AS BIGINT) AS w
            FROM lineitem
        ), totals AS (
            SELECT o_orderkey AS k,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) // 10
                       AS pool_cents
            FROM orders
        ), base AS (
            SELECT i.k, i.ln, i.w, t.pool_cents,
                   sum(i.w) OVER (PARTITION BY i.k) AS wsum
            FROM items i JOIN totals t ON i.k = t.k
        ), floored AS (
            SELECT k, ln, w, pool_cents, wsum,
                   (pool_cents * w) // wsum AS base_cents,
                   (pool_cents * w) % wsum AS remainder,
                   pool_cents - sum((pool_cents * w) // wsum)
                       OVER (PARTITION BY k) AS leftover
            FROM base
        ), ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY k ORDER BY remainder DESC, ln) AS rk
            FROM floored
        ), alloc AS (
            SELECT k, ln,
                   base_cents + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                       AS cents
            FROM ranked
        )
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(mismatch) AS BIGINT) AS n_mismatched,
               CAST(min(spread) AS BIGINT) AS min_spread,
               CAST(max(spread) AS BIGINT) AS max_spread,
               CAST(sum(total_alloc) AS BIGINT) AS total_alloc_cents
        FROM (
            SELECT a.k,
                   CASE WHEN sum(a.cents) <> max(t.pool_cents)
                        THEN 1 ELSE 0 END AS mismatch,
                   max(a.cents) - min(a.cents) AS spread,
                   sum(a.cents) AS total_alloc
            FROM alloc a JOIN totals t ON a.k = t.k
            GROUP BY a.k
        )
    """,
    group="allocation",
)
def alloc_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocate 10% of each order's price (in exact cents) across its
    lineitems proportionally to quantity by the largest-remainder
    method, then AUDIT the invariant: per order, the allocations must
    sum to the pool exactly. The hashed report is the audit — order
    count, how many orders violate conservation (must be 0), the
    min/max within-order allocation spread, and the global allocated
    total (equal to the sum of pools by construction).

    Scale shape: everything partitions by order key — one join attaches
    the pool, two windows (weight sum, remainder rank) run in the same
    per-order partition, so Catalyst plans a single exchange. Integer
    division/modulo only; ``pool·w`` peaks well under 2⁶³ (cents ×
    quantity ≤ ~5e9). The method generalizes to any parent/child
    allocation where "off by a penny sometimes" is an incident report.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    pool = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.round(F.col("o_totalprice") * 100, 0).cast("bigint") / 10)
        .cast("bigint")
        .alias("pool_cents"),
    )
    wk = W.partitionBy("k")
    base = li.join(pool, "k").withColumn("wsum", F.sum("w").over(wk))
    prod = F.col("pool_cents") * F.col("w")
    floored = base.select(
        "k",
        "ln",
        "pool_cents",
        F.floor(prod / F.col("wsum")).cast("bigint").alias("base_cents"),
        (prod % F.col("wsum")).alias("remainder"),
    ).withColumn(
        "leftover", F.col("pool_cents") - F.sum("base_cents").over(wk)
    )
    ranked = floored.withColumn(
        "rk",
        F.row_number().over(wk.orderBy(F.desc("remainder"), "ln")),
    )
    alloc = ranked.select(
        "k",
        "pool_cents",
        (
            F.col("base_cents")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).alias("cents"),
    )
    per_order = alloc.groupBy("k").agg(
        F.when(F.sum("cents") != F.max("pool_cents"), 1).otherwise(0).alias(
            "mismatch"
        ),
        (F.max("cents") - F.min("cents")).alias("spread"),
        F.sum("cents").alias("total_alloc"),
    )
    return per_order.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("mismatch").cast("bigint").alias("n_mismatched"),
        F.min("spread").cast("bigint").alias("min_spread"),
        F.max("spread").cast("bigint").alias("max_spread"),
        F.sum("total_alloc").cast("bigint").alias("total_alloc_cents"),
    )
