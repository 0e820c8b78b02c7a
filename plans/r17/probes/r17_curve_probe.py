"""r17 probe: retention-curve candidate-generation phase attribution.

Measures (noop sink, labeled jobs, fresh warm session at llm-suite confs):
  A. prefix join RAW output (no distinct): rows + wall
  B. prefix join + distinct (current kernel): rows + wall
  C. current full op phases: cand(distinct)+ensure_parallelism vs verify+agg
  D. prototype: raw join -> broadcast-meta verify -> lvl>0 filter ->
     dropDuplicates(pair) -> class-grain agg  (filter-before-exchange shape)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from desdb_spark.extensions.dedup import (
    ensure_parallelism,
    prefix_filtered_pairs,
)
from desdb_spark.extensions.dedup_curve import GRID_PCT
from desdb_spark.session import get_spark, load_table

SF = "/root/testdata/sf0.1"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, thunk, n=1):
    outs = []
    for _ in range(n):
        t0 = time.perf_counter()
        thunk()
        outs.append(time.perf_counter() - t0)
    print(f"{label}: {' '.join(f'{t:.2f}' for t in outs)} s", flush=True)
    return min(outs)


def main():
    spark = get_spark(
        "r17-curve-probe",
        shuffle_partitions=32,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4194304",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    d = load_table(spark, SF, "documents")
    classes = (
        ensure_parallelism(d)
        .select("doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
        .groupBy(F.xxhash64(F.sort_array("toks")).alias("h"))
        .agg(
            F.min("doc_id").alias("id"),
            F.count("*").cast("bigint").alias("c"),
            F.min_by("toks", "doc_id").alias("toks"),
        )
        .select(
            "id", "c", "toks", F.size("toks").alias("n"),
            F.expr("transform(toks, t -> xxhash64(t))").alias("toksh"),
        )
        .localCheckpoint()
    )
    reps = classes.select("id", F.concat_ws(" ", "toks").alias("text"))
    # token stats
    stats = classes.agg(
        F.count("*").alias("ncls"), F.avg("n").alias("avg_n"),
        F.max("n").alias("max_n"),
    ).first()
    print(f"classes={stats.ncls} avg_n={stats.avg_n:.1f} max_n={stats.max_n}")

    # warm the prefix machinery once
    sc.setJobDescription("warm")
    noop(prefix_filtered_pairs(reps, t_num=1, t_den=2, id_col="id"))

    # --- A: raw join output (kernel minus its .distinct()) ---
    # Rebuild the kernel body inline minus distinct, via the private pieces.
    from desdb_spark.extensions.dedup import (
        HOT_PREFIX_COUNT, SALT_BUCKETS_MAX, prefix_tokens,
    )

    def raw_pairs():
        docs = reps
        t_num, t_den = 1, 2
        target = sc.defaultParallelism
        salts = min(target, SALT_BUCKETS_MAX)
        prefix = prefix_tokens(docs, t_num, t_den, id_col="id").localCheckpoint()
        hot = F.broadcast(
            prefix.groupBy("tok").count()
            .where(F.col("count") > HOT_PREFIX_COUNT)
            .select("tok", F.lit(True).alias("hot"))
        )
        salted = prefix.join(hot, "tok", "left")
        both = t_num + t_den
        idx_len = (
            F.col("n") - F.expr(f"(n * {2 * t_num} + {both} - 1) div {both}") + 1
        )
        a = (
            salted.where(F.col("rn") <= idx_len)
            .withColumn(
                "salt",
                F.explode(
                    F.when(
                        F.col("hot").isNotNull(),
                        F.sequence(F.lit(0), F.lit(salts - 1)),
                    ).otherwise(F.array(F.lit(0)))
                ),
            )
            .repartition(target, "tok", "salt")
            .alias("a")
        )
        b = (
            salted.withColumn(
                "salt",
                F.when(
                    F.col("hot").isNotNull(),
                    F.pmod(F.xxhash64("doc_id"), F.lit(salts)).cast("int"),
                ).otherwise(F.lit(0)),
            )
            .repartition(target, "tok", "salt")
            .alias("b")
        )
        smaller_first = (F.col("a.n") < F.col("b.n")) | (
            (F.col("a.n") == F.col("b.n"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
        )
        pos_bound = F.lit(1) + F.least(
            F.col("a.n") - F.col("a.rn"), F.col("b.n") - F.col("b.rn")
        )
        positional = pos_bound * both >= t_num * (F.col("a.n") + F.col("b.n"))
        return a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.salt") == F.col("b.salt"))
            & smaller_first
            & (F.col("b.n") * t_num <= F.col("a.n") * t_den)
            & positional,
        ).select(
            F.least("a.doc_id", "b.doc_id").alias("id_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("id_b"),
        )

    sc.setJobDescription("A raw join rows")
    nraw = raw_pairs().count()
    print(f"raw join rows = {nraw}")
    sc.setJobDescription("A raw join noop")
    timed("A raw join (noop)", lambda: noop(raw_pairs()), n=2)

    sc.setJobDescription("B distinct")
    ndis = prefix_filtered_pairs(reps, t_num=1, t_den=2, id_col="id").count()
    print(f"distinct pairs = {ndis}  dup_factor = {nraw/max(ndis,1):.3f}")
    timed(
        "B join+distinct (noop)",
        lambda: noop(prefix_filtered_pairs(reps, t_num=1, t_den=2, id_col="id")),
        n=2,
    )
    timed(
        "C cand+ensure_parallelism (noop, current op shape)",
        lambda: noop(
            ensure_parallelism(
                prefix_filtered_pairs(reps, t_num=1, t_den=2, id_col="id")
            )
        ),
        n=2,
    )

    # --- D: prototype filter-before-exchange shape ---
    meta = classes.select("id", "c", "n", "toksh")

    def proto():
        cand = raw_pairs()
        sa = meta.alias("sa")
        sb = meta.alias("sb")
        i = F.size(F.array_intersect("sa.toksh", "sb.toksh"))
        pairs = (
            cand.join(F.broadcast(sa), F.col("id_a") == F.col("sa.id"))
            .join(F.broadcast(sb), F.col("id_b") == F.col("sb.id"))
            .select(
                "id_a", "id_b",
                F.col("sa.c").alias("c_a"), F.col("sb.c").alias("c_b"),
                i.alias("i"),
                (F.col("sa.n") + F.col("sb.n")).alias("s"),
            )
        )
        lvl = sum(
            ((100 + p) * F.col("i") >= p * F.col("s")).cast("int")
            for p in GRID_PCT
        )
        qual = (
            pairs.withColumn("lvl", lvl)
            .where(F.col("lvl") > 0)
            .withColumn("w", (F.col("c_a") * F.col("c_b")).cast("bigint"))
            .dropDuplicates(["id_a", "id_b"])
        )
        ranks = range(1, len(GRID_PCT) + 1)
        edges = qual.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("x"), F.col("id_b").alias("nb")),
                    F.struct(F.col("id_b").alias("x"), F.col("id_a").alias("nb")),
                )
            ).alias("e"),
            "lvl", "w",
        ).select("e.x", "e.nb", "lvl", "w")
        perx = edges.groupBy("x").agg(
            *[F.min(F.when(F.col("lvl") >= r, F.col("nb"))).alias(f"m{r}") for r in ranks],
            *[F.sum(F.when(F.col("lvl") == r, F.col("w"))).alias(f"s{r}") for r in ranks],
        )
        return perx.agg(
            *[F.sum((F.col(f"m{r}") < F.col("x")).cast("bigint")).alias(f"lost{r}") for r in ranks],
            *[F.sum(f"s{r}").alias(f"g{r}") for r in ranks],
        )

    sc.setJobDescription("D qual rows")
    q = proto()
    row = q.first()
    print("proto fin row:", row.asDict())
    sc.setJobDescription("D proto agg")
    timed("D raw->verify->filter->dedup->agg (first)", lambda: proto().first(), n=3)

    # current full op end-to-end for comparison
    from desdb_spark.extensions.dedup_curve import dedup_jaccard_retention_curve
    sc.setJobDescription("E current op")
    timed(
        "E current full op (toPandas)",
        lambda: dedup_jaccard_retention_curve(spark, SF).toPandas(),
        n=3,
    )
    # qualifying distinct count for the record
    print("qual distinct pairs =", proto.__name__ and None)


if __name__ == "__main__":
    main()
