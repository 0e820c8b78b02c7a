"""Round-6 batch-5 skyline (Pareto frontier) query.

"Show me the orders that are not beaten on BOTH price and recency" —
the skyline operator (Börzsönyi/Kossmann/Stocker, ICDE 2001, public
literature). A point survives iff no other point is ≤ on cost and ≥ on
benefit with at least one strict. Naive evaluation is the quadratic
NOT-EXISTS self-join; the 2-D case collapses to a SORT + RUNNING MAX:
order by (cost asc, benefit desc) and a point is dominated iff some
strictly-preceding point's benefit already reached it.

The distributed shape is two-phase: a LOCAL prune per price-range
bucket (dominated-in-bucket ⇒ dominated globally, so pruning is always
safe), then the exact sweep over the few survivors. Phase 1 touches
the full data partition-parallel; phase 2's input is ~buckets ×
skyline-size — tiny. That is the standard parallel-skyline recipe and
the reason this op survives 100 TB while NOT EXISTS does not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


def skyline_2d(
    df: DataFrame, cost: str, benefit: str, n_buckets: int = 32
) -> DataFrame:
    """Exact 2-D skyline (minimize ``cost``, maximize ``benefit``) of
    the DISTINCT (cost, benefit) pairs, via local-prune + global sweep.

    Bucketing uses ``ntile`` over cost so bucket boundaries are a
    deterministic function of the data, not of partitioning; the local
    sweep inside each bucket and the global sweep over survivors are
    the same running-max window, so correctness never depends on the
    prune (remove the phase-1 window and results are identical, just
    slower)."""
    pts = df.select(cost, benefit).distinct()
    order = [F.col(cost).asc(), F.col(benefit).desc()]
    bucket_w = W.orderBy(*order)
    local_w = (
        W.partitionBy("_b").orderBy(*order).rowsBetween(W.unboundedPreceding, -1)
    )
    global_w = W.orderBy(*order).rowsBetween(W.unboundedPreceding, -1)
    survivors = (
        pts.withColumn("_b", F.ntile(n_buckets).over(bucket_w))
        .withColumn("_lmax", F.max(benefit).over(local_w))
        .where(F.col("_lmax").isNull() | (F.col("_lmax") < F.col(benefit)))
        .drop("_b", "_lmax")
    )
    return (
        survivors.withColumn("_gmax", F.max(benefit).over(global_w))
        .where(F.col("_gmax").isNull() | (F.col("_gmax") < F.col(benefit)))
        .drop("_gmax")
    )


@register(
    "analytics_skyline_2d",
    oracle="""
        WITH pts AS (
            SELECT DISTINCT round(o_totalprice, 2) AS price,
                   o_orderdate AS odate
            FROM orders
        )
        SELECT p.price, p.odate
        FROM pts p
        WHERE NOT EXISTS (
            SELECT 1 FROM pts q
            WHERE q.price <= p.price AND q.odate >= p.odate
              AND (q.price < p.price OR q.odate > p.odate)
        )
    """,
    group="skyline",
)
def analytics_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of orders on (price ↓ better, order date ↑
    better): the orders no other order beats on both axes. The oracle
    is the literal quadratic NOT-EXISTS definition — fine for DuckDB at
    fixture scale, which is exactly the point: the Spark side runs the
    O(n log n) two-phase sweep instead and must produce the identical
    frontier.

    Scale shape: one distinct-project (map-side combinable), an ntile
    bucketing window, per-bucket running-max prune (partition-parallel
    after one range shuffle), then the exact sweep over ~|skyline| ×
    buckets survivors — a single small-partition window. The global
    ntile itself is the phase to replace at 100 TB (approximate range
    boundaries from a sample, same prune safety); the survivor sweep
    stays tiny regardless.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.round("o_totalprice", 2).alias("price"),
        F.col("o_orderdate").alias("odate"),
    )
    return skyline_2d(o, "price", "odate").orderBy("price")
