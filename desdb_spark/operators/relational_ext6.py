"""Relational coverage extensions, round 5 batch 2: CDC-style MERGE and
quantile bucketing.

Two warehouse-maintenance shapes a desdb user ran server-side
[desdb:desdb.py quick — reconstructed, SURVEY.md §0]: applying a change
batch onto a keyed snapshot (MERGE INTO semantics, expressed engine-
neutrally as a full-outer reconciliation so the differential can check
it without a lakehouse format), and data-driven decile segmentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "merge_upsert_snapshot",
    oracle="""
        WITH base AS (
          SELECT o_custkey, o_orderdate, o_totalprice FROM (
            SELECT o_custkey, o_orderdate, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC,
                                               o_orderkey DESC) AS rn
            FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01')
          WHERE rn = 1),
        changes AS (
          SELECT o_custkey, o_orderdate, o_totalprice FROM (
            SELECT o_custkey, o_orderdate, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC,
                                               o_orderkey DESC) AS rn
            FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
          WHERE rn = 1)
        SELECT COALESCE(c.o_custkey, b.o_custkey) AS custkey,
               COALESCE(c.o_orderdate, b.o_orderdate) AS last_order,
               round(COALESCE(c.o_totalprice, b.o_totalprice), 2)
                 AS last_price,
               CASE WHEN b.o_custkey IS NULL THEN 'inserted'
                    WHEN c.o_custkey IS NULL THEN 'kept'
                    ELSE 'updated' END AS merge_action
        FROM base b FULL OUTER JOIN changes c ON b.o_custkey = c.o_custkey
    """,
    group="relational_ext6",
)
def merge_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE shape: reconcile a keyed snapshot (each customer's last
    order state before 2000) with a change batch (their last state
    since), emitting the merged row plus its merge action — the exact
    row-level contract of ``MERGE INTO … WHEN MATCHED / NOT MATCHED``,
    expressed as a full-outer join so it runs on plain parquet and is
    oracle-checkable (a lakehouse table format would add ACID commit
    semantics around the SAME plan).

    Scale shape: both sides reduce to one row per key BEFORE the merge
    join (row_number over custkey — the dedup and the join share the
    custkey exchange). The full-outer join shuffles on the merge key,
    exactly like Delta/Iceberg MERGE's inner rewrite; date predicates
    push to both scans.
    """
    o = load_table(spark, sf_dir, "orders")

    def last_state(side: DataFrame) -> DataFrame:
        w = Window.partitionBy("o_custkey").orderBy(
            F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
        )
        return (
            side.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("o_custkey", "o_orderdate", "o_totalprice")
        )

    base = last_state(o.where(F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")))
    changes = last_state(
        o.where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    )
    b = base.alias("b")
    c = changes.alias("c")
    return b.join(c, F.col("b.o_custkey") == F.col("c.o_custkey"), "full_outer").select(
        F.coalesce("c.o_custkey", "b.o_custkey").alias("custkey"),
        F.coalesce("c.o_orderdate", "b.o_orderdate").alias("last_order"),
        F.round(F.coalesce("c.o_totalprice", "b.o_totalprice"), 2).alias("last_price"),
        F.when(F.col("b.o_custkey").isNull(), "inserted")
        .when(F.col("c.o_custkey").isNull(), "kept")
        .otherwise("updated")
        .alias("merge_action"),
    )


@register(
    "window_ntile_deciles",
    oracle="""
        WITH ranked AS (
          SELECT c_mktsegment, c_acctbal,
                 ntile(10) OVER (PARTITION BY c_mktsegment
                                 ORDER BY c_acctbal, c_custkey) AS decile
          FROM customer)
        SELECT c_mktsegment, decile, CAST(count(*) AS BIGINT) AS n,
               round(min(c_acctbal), 2) AS lo,
               round(max(c_acctbal), 2) AS hi,
               round(sum(c_acctbal), 2) AS total
        FROM ranked GROUP BY c_mktsegment, decile
    """,
    group="relational_ext6",
)
def window_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven decile bucketing: ntile(10) over account balance
    WITHIN each market segment, rolled up to per-decile boundaries and
    totals — the quantile-segmentation report (and the exact-quantile
    complement to the fixed-threshold RFM op).

    Determinism: the ntile order carries c_custkey as a total tie-break,
    so equal balances land in the same decile in both engines.

    Scale shape: the window partitions on c_mktsegment — a global-order
    ntile would single-task the sort; per-segment it is a parallel
    range-sort within each segment's partition, and the follow-up
    groupBy reuses the same key prefix. At 100 TB with few segments,
    the honest alternative is approx_percentile cut points + a
    broadcast bucket join; this op keeps exact semantics and documents
    that trade.
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    ranked = c.select(
        "c_mktsegment",
        "c_acctbal",
        F.ntile(10).over(w).cast("bigint").alias("decile"),
    )
    return ranked.groupBy("c_mktsegment", "decile").agg(
        F.count("*").alias("n"),
        F.round(F.min("c_acctbal"), 2).alias("lo"),
        F.round(F.max("c_acctbal"), 2).alias("hi"),
        F.round(F.sum("c_acctbal"), 2).alias("total"),
    )
