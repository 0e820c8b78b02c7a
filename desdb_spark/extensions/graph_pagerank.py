"""Fixed-point PageRank top-k (registered op `graph_pagerank_topk`).

r9 module move (VERDICT r8 item 1, same mechanism as the r8 moves): the
registered op split out of extensions/graph_ext.py so the r9 driver
window can hold exactly the driver-pending ops — its r8c rows→hash
oracle upgrade (exact BIGINT-picos ranks + unrolled-CTE oracle)
postdates its last (rows-only, r7) driver row. The iteration kernels
(``pagerank_fixedpoint``, the float ``pagerank``) and the oracle
generator stay in extensions/graph_ext.py unchanged and are imported
here; only the registration site moved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.extensions.graph_ext import (
    PR_ITERATIONS,
    _pagerank_oracle,
    pagerank_fixedpoint,
)
from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "graph_pagerank_topk",
    # r8c rows→hash upgrade: fixed-point integer ranks make the
    # 10-round iteration order-independent, and the oracle unrolls the
    # same rounds as chained CTEs — the iterative-algorithm class IS
    # SQL-expressible once the arithmetic is exact.
    oracle=_pagerank_oracle(),
    group="graph_pagerank",
)
def graph_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank nodes of the directed customer→supplier order
    graph (an edge when a customer's order contains a supplier's line):
    10 damped power iterations with dangling-mass redistribution, ranks
    in exact BIGINT picos (α = 0.85 as the integer ratio 85/100, floor
    division throughout).

    Hash-checked against an unrolled 10-round CTE oracle; the float
    kernel (``graph_ext.pagerank``) remains for callers who want IEEE
    ranks, with its NumPy 1e-9 parity test in tests/test_graph_ext.py —
    the fixed-point op additionally carries its own integer NumPy mirror
    there.

    r12b edge-build rework (the iterations were ~5 s; the BUILD was
    ~12 s of the old 15 s wall): (a) node ids are BIGINT throughout the
    pipeline — src = 2·custkey, dst = 2·suppkey+1, an injective
    even/odd encoding of the bipartite vertex set — so the distinct,
    every per-round join/groupBy, and the checkpointed edge payload hash
    and shuffle 8-byte longs instead of 'c…'/'s…' strings; the display
    label is reconstructed AFTER the last iteration on the 16k-row rank
    vector (before the ORDER BY, so the oracle's string tie-break is
    reproduced exactly). (b) ``ensure_parallelism`` on lineitem — the
    fixture packs 600k rows into one row group, which planned the
    join+distinct as a near-single-task stage (the dedup.py trap); at
    real scale the guard is a no-op.
    """
    from desdb_spark.extensions.dedup import ensure_parallelism

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = ensure_parallelism(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    )
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey").cast("bigint") * 2).alias("src"),
            (F.col("l_suppkey").cast("bigint") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank_fixedpoint(edges, iterations=PR_ITERATIONS)
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("c"), (F.col("node") / 2).cast("bigint")),
    ).otherwise(F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("bigint")))
    return (
        ranks.select(label.alias("node"), F.col("rank").alias("rank_picos"))
        .orderBy(F.desc("rank_picos"), "node")
        .limit(20)
    )
