"""Round-6 batch-4 incremental aggregate maintenance (materialized-view
style).

At 100 TB you never recompute a daily rollup from scratch: you keep the
rollup's MERGEABLE PARTIAL STATE (count, sum, sum-of-squares, min, max —
each an associative commutative monoid) per group, aggregate only the
new partition of data into the same partial shape, and merge. This is
exactly Spark's own two-phase partial/final aggregation, lifted to the
storage layer — the published pattern behind incremental view
maintenance (Gray et al.'s "Data Cube" partials; every streaming-agg
state store does the same).

The registered op stages the snapshot/delta split by date inside one
plan so the driver can hash-check the whole maintenance cycle against a
from-scratch DuckDB aggregate: if merging partials were wrong in ANY
group, the hash would differ. Derived stats come only from merged
partials — the op never touches a snapshot-side raw row at merge time.
The s2 partial also rides along for variance, but variance is
deliberately NOT in the hashed output: the naive-sum-of-squares vs
Welford summation orders of the two engines legitimately differ by
O(n·eps·s2) on a ~1e10-scale value, and no fixed rounding absorbs a
drift that can straddle any bin edge — tests/test_incremental.py checks
the variance identity with a relative tolerance instead.

Reference parity: desdb had no incremental surface (SURVEY.md §2A —
reconstructed); new engine capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: The snapshot/delta boundary: orders strictly before this date form the
#: "yesterday's rollup" snapshot; the rest is the newly-arrived delta.
CUTOFF = "1997-01-01"


def partials(df: DataFrame, key: str, val: str) -> DataFrame:
    """Aggregate ``df`` to the mergeable partial state per ``key``:
    (n, s, s2, mn, mx). Map-side combinable; this is the shape you'd
    persist as the materialized view's state table."""
    c = F.col(val).cast("double")
    return df.groupBy(key).agg(
        F.count("*").alias("n"),
        F.sum(c).alias("s"),
        F.sum(c * c).alias("s2"),
        F.min(c).alias("mn"),
        F.max(c).alias("mx"),
    )


def merge_partials(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """Merge two partial-state tables: full outer on the group key, then
    each monoid's merge (sum for n/s/s2, min/mn, max/mx). At scale both
    sides are already partitioned by ``key`` (the state table is written
    bucketed), so this is a co-located merge join; the delta side is
    usually tiny relative to the snapshot."""
    cols = ("n", "s", "s2", "mn", "mx")
    bb = b.select(key, *[F.col(c).alias(f"_b_{c}") for c in cols])
    joined = a.join(bb, key, "full_outer")
    z = {"n": F.lit(0).cast("long"), "s": F.lit(0.0), "s2": F.lit(0.0)}
    merged = joined.select(
        key,
        (F.coalesce(F.col("n"), z["n"]) + F.coalesce(F.col("_b_n"), z["n"])).alias("n"),
        (F.coalesce(F.col("s"), z["s"]) + F.coalesce(F.col("_b_s"), z["s"])).alias("s"),
        (F.coalesce(F.col("s2"), z["s2"]) + F.coalesce(F.col("_b_s2"), z["s2"])).alias(
            "s2"
        ),
        F.least(F.col("mn"), F.col("_b_mn")).alias("_mn_both"),
        F.coalesce(F.col("mn"), F.col("_b_mn")).alias("_mn_one"),
        F.greatest(F.col("mx"), F.col("_b_mx")).alias("_mx_both"),
        F.coalesce(F.col("mx"), F.col("_b_mx")).alias("_mx_one"),
    )
    return merged.select(
        key,
        "n",
        "s",
        "s2",
        F.coalesce("_mn_both", "_mn_one").alias("mn"),
        F.coalesce("_mx_both", "_mx_one").alias("mx"),
    )


@register(
    "agg_incremental_merge",
    oracle=f"""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS total,
               round(avg(o_totalprice), 4) AS avg_price,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price
        FROM orders GROUP BY o_orderpriority
    """,
    group="incremental",
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority order stats maintained INCREMENTALLY: partial state
    from orders before {CUTOFF} (the stored snapshot), partial state from
    orders on/after it (the newly-arrived delta), one monoid merge, then
    the final stats derived purely from merged partials. The DuckDB
    oracle recomputes from scratch over all orders — equality proves the
    merge is exact per group (count/sum/avg/min/max; the variance
    identity var = (s2 - s²/n)/(n-1) is tolerance-checked in pytest —
    see the module docstring for why it can't sit under a bit-exact
    hash).

    Scale shape: each partial aggregation is map-side combinable over
    its own date-pruned scan (at scale, partition pruning means the
    delta scan touches ONLY new partitions); the merge shuffles partial
    rows (one per group), never raw data.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderdate"
    )
    cut = F.lit(CUTOFF).cast("date")
    snapshot = partials(
        o.where(F.col("o_orderdate") < cut), "o_orderpriority", "o_totalprice"
    )
    delta = partials(
        o.where(F.col("o_orderdate") >= cut), "o_orderpriority", "o_totalprice"
    )
    m = merge_partials(snapshot, delta, "o_orderpriority")
    n, s, s2 = F.col("n"), F.col("s"), F.col("s2")
    return m.select(
        "o_orderpriority",
        n.cast("bigint").alias("n_orders"),
        F.round(s, 2).alias("total"),
        F.round(s / n, 4).alias("avg_price"),
        F.round("mn", 2).alias("min_price"),
        F.round("mx", 2).alias("max_price"),
    )
