"""r17 probe: pagerank iteration-loop variants.

A: current kernel (ckpt every round, dmass first() per round)
B: ckpt every 2nd round
C: key-aligned pre-partitioning (edg by src, nodes by node) so the
   per-round joins reuse partitioning (guide §2.4), ckpt every round
D: C + ckpt every 2nd round
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from desdb_spark.extensions.dedup import ensure_parallelism
from desdb_spark.extensions.graph_ext import PR_ALPHA_DEN, PR_ALPHA_NUM, PR_ITERATIONS
from desdb_spark.extensions.graph_ext import PR_SCALE
from desdb_spark.session import get_spark, load_table

SF = "/root/testdata/sf0.1"


def build_edges(spark):
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = ensure_parallelism(
        load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey").cast("bigint") * 2).alias("src"),
            (F.col("l_suppkey").cast("bigint") * 2 + 1).alias("dst"),
        )
        .distinct()
    )


def kernel(edges, iterations, ckpt_every=1, align=False, npart=32):
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("od"))
    edg = edges.join(outdeg, "src")
    if align:
        edg = edg.repartition(npart, "src")
    edg = edg.localCheckpoint(eager=False)
    has_out = outdeg.select(F.col("src").alias("node"), F.lit(1).alias("has_out"))
    nodes = nodes.join(has_out, "node", "left").select(
        "node", F.col("has_out").isNull().alias("dang")
    )
    if align:
        nodes = nodes.repartition(npart, "node")
    nodes = nodes.localCheckpoint(eager=False)
    n = nodes.count()
    base = (PR_ALPHA_DEN - PR_ALPHA_NUM) * PR_SCALE // (PR_ALPHA_DEN * n)
    ranks = nodes.select(
        "node", "dang", F.lit(PR_SCALE // n).cast("bigint").alias("rank")
    ).localCheckpoint(eager=False)
    contrib_expr = F.expr(f"({PR_ALPHA_NUM} * rank) div ({PR_ALPHA_DEN} * od)")
    for it in range(iterations):
        dmass = (
            ranks.where(F.col("dang"))
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("dm"))
            .first()[0]
        )
        dterm = PR_ALPHA_NUM * int(dmass) // (PR_ALPHA_DEN * n)
        contrib = (
            ranks.join(edg, ranks.node == edg.src)
            .groupBy("dst")
            .agg(F.sum(contrib_expr).alias("f"))
        )
        ranks = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            "dang",
            (F.lit(base) + F.coalesce(F.col("f"), F.lit(0)) + F.lit(dterm))
            .cast("bigint")
            .alias("rank"),
        )
        if (it + 1) % ckpt_every == 0 or it == iterations - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank")


def main():
    spark = get_spark(
        "r17-pr-probe", shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4194304",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm + reference result
    ref = sorted(
        (r.node, r.rank)
        for r in kernel(build_edges(spark), PR_ITERATIONS).collect()
    )

    for tag, kw in [
        ("A ckpt1", dict(ckpt_every=1)),
        ("B ckpt2", dict(ckpt_every=2)),
        ("C align ckpt1", dict(ckpt_every=1, align=True)),
        ("D align ckpt2", dict(ckpt_every=2, align=True)),
        ("E align ckpt3", dict(ckpt_every=3, align=True)),
    ]:
        runs = []
        for _ in range(3):
            try:
                sc._jvm.System.gc()
            except Exception:
                pass
            sc.setJobDescription(f"pr {tag}")
            t0 = time.perf_counter()
            out = kernel(build_edges(spark), PR_ITERATIONS, **kw)
            got = sorted((r.node, r.rank) for r in out.collect())
            runs.append(time.perf_counter() - t0)
            assert got == ref, f"{tag} diverged"
        runs.sort()
        print(tag, [round(r, 2) for r in runs], flush=True)


if __name__ == "__main__":
    main()
