"""r17 probe 2: retention-curve remaining-phase attribution (warm session).

Phases: classes checkpoint | driver scalars | candidate gen (already
measured: 4.8 s with wrapper, 4.0 without, 2.5 raw) | verify+agg from a
materialized candidate frame | explicit-width dedup variant of the kernel.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from desdb_spark.extensions.dedup import ensure_parallelism, prefix_filtered_pairs
from desdb_spark.extensions.dedup_curve import GRID_PCT
from desdb_spark.session import get_spark, load_table

SF = "/root/testdata/sf0.1"


def timed(label, thunk, n=3):
    outs = []
    for _ in range(n):
        t0 = time.perf_counter()
        thunk()
        outs.append(time.perf_counter() - t0)
    print(f"{label}: {' '.join(f'{t:.2f}' for t in outs)} s", flush=True)


def build_classes(spark, d):
    return (
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
    )


def main():
    spark = get_spark(
        "r17-curve-probe2",
        shuffle_partitions=32,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4194304",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    d = load_table(spark, SF, "documents")

    # warm
    build_classes(spark, d).localCheckpoint().count()

    sc.setJobDescription("classes ckpt")
    timed("classes localCheckpoint", lambda: build_classes(spark, d).localCheckpoint())

    classes = build_classes(spark, d).localCheckpoint()
    sc.setJobDescription("driver scalars")
    timed(
        "tot scalars first()",
        lambda: classes.agg(
            F.sum("c").alias("docs"), F.count("*").alias("ncls"),
            F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("bigint").alias("within"),
        ).first(),
    )

    reps = classes.select("id", F.concat_ws(" ", "toks").alias("text"))
    sc.setJobDescription("cand ckpt")
    cand = ensure_parallelism(
        prefix_filtered_pairs(reps, t_num=1, t_den=2, id_col="id")
    ).localCheckpoint()
    print("cand rows:", cand.count(), flush=True)

    meta = classes.select("id", "c", "n", "toksh")
    sa = meta.alias("sa")
    sb = meta.alias("sb")
    i = F.size(F.array_intersect("sa.toksh", "sb.toksh"))
    ranks = range(1, len(GRID_PCT) + 1)

    def verify_agg():
        pairs = (
            cand.join(F.broadcast(sa), F.col("id_a") == F.col("sa.id"))
            .join(F.broadcast(sb), F.col("id_b") == F.col("sb.id"))
            .select(
                "id_a", "id_b",
                F.col("sa.c").alias("c_a"), F.col("sb.c").alias("c_b"),
                i.alias("i"), (F.col("sa.n") + F.col("sb.n")).alias("s"),
            )
        )
        lvl = sum(
            ((100 + p) * F.col("i") >= p * F.col("s")).cast("int") for p in GRID_PCT
        )
        edges = (
            pairs.withColumn("lvl", lvl)
            .where(F.col("lvl") > 0)
            .withColumn("w", (F.col("c_a") * F.col("c_b")).cast("bigint"))
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("id_a").alias("x"), F.col("id_b").alias("nb")),
                        F.struct(F.col("id_b").alias("x"), F.col("id_a").alias("nb")),
                    )
                ).alias("e"), "lvl", "w",
            )
            .select("e.x", "e.nb", "lvl", "w")
        )
        perx = edges.groupBy("x").agg(
            *[F.min(F.when(F.col("lvl") >= r, F.col("nb"))).alias(f"m{r}") for r in ranks],
            *[F.sum(F.when(F.col("lvl") == r, F.col("w"))).alias(f"s{r}") for r in ranks],
        )
        return perx.agg(
            *[F.sum((F.col(f"m{r}") < F.col("x")).cast("bigint")).alias(f"lost{r}") for r in ranks],
            *[F.sum(f"s{r}").alias(f"g{r}") for r in ranks],
        ).first()

    sc.setJobDescription("verify+agg from ckpt cand")
    timed("verify+agg (from checkpointed cand)", verify_agg)

    # Kernel variant: explicit-width dedup instead of plain distinct,
    # no ensure_parallelism wrapper.
    from desdb_spark.extensions.dedup import (
        HOT_PREFIX_COUNT, SALT_BUCKETS_MAX, prefix_tokens,
    )

    def kernel_explicit_dedup():
        docs, t_num, t_den = reps, 1, 2
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
            (F.col("a.n") == F.col("b.n")) & (F.col("a.doc_id") < F.col("b.doc_id"))
        )
        pos_bound = F.lit(1) + F.least(
            F.col("a.n") - F.col("a.rn"), F.col("b.n") - F.col("b.rn")
        )
        positional = pos_bound * both >= t_num * (F.col("a.n") + F.col("b.n"))
        return (
            a.join(
                b,
                (F.col("a.tok") == F.col("b.tok"))
                & (F.col("a.salt") == F.col("b.salt"))
                & smaller_first
                & (F.col("b.n") * t_num <= F.col("a.n") * t_den)
                & positional,
            )
            .select(
                F.least("a.doc_id", "b.doc_id").alias("id_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("id_b"),
            )
            .repartition(target, "id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )

    sc.setJobDescription("kernel explicit dedup")
    def noop(df):
        df.write.format("noop").mode("overwrite").save()
    print("explicit-dedup rows:", kernel_explicit_dedup().count(), flush=True)
    timed("kernel explicit-width dedup (noop)", lambda: noop(kernel_explicit_dedup()), n=2)


if __name__ == "__main__":
    main()
