"""r17 probe 4: kill the lvl>0 filter (pushdown duplicates the intersect)
and try cheaper explode shapes."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from desdb_spark.extensions.dedup import ensure_parallelism, prefix_filtered_pairs
from desdb_spark.extensions.dedup_curve import GRID_PCT
from desdb_spark.session import get_spark, load_table

SF = "/root/testdata/sf0.1"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, thunk, n=3):
    outs = []
    for _ in range(n):
        t0 = time.perf_counter()
        thunk()
        outs.append(time.perf_counter() - t0)
    print(f"{label}: {' '.join(f'{t:.2f}' for t in outs)} s", flush=True)


def main():
    spark = get_spark(
        "r17-curve-probe4",
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
    cand = ensure_parallelism(
        prefix_filtered_pairs(reps, t_num=1, t_den=2, id_col="id")
    ).localCheckpoint()
    cand.count()

    meta = classes.select("id", "c", "n", "toksh")
    sa = meta.alias("sa")
    sb = meta.alias("sb")
    i = F.size(F.array_intersect("sa.toksh", "sb.toksh"))
    ranks = range(1, len(GRID_PCT) + 1)

    def pairs_df():
        return (
            cand.join(F.broadcast(sa), F.col("id_a") == F.col("sa.id"))
            .join(F.broadcast(sb), F.col("id_b") == F.col("sb.id"))
            .select(
                "id_a", "id_b",
                F.col("sa.c").alias("c_a"), F.col("sb.c").alias("c_b"),
                i.alias("i"), (F.col("sa.n") + F.col("sb.n")).alias("s"),
            )
        )

    lvl_expr = sum(
        ((100 + p) * F.col("i") >= p * F.col("s")).cast("int") for p in GRID_PCT
    )

    def edges_nofilter_struct():
        return (
            pairs_df().withColumn("lvl", lvl_expr)
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

    def edges_nofilter_arith():
        return (
            pairs_df().withColumn("lvl", lvl_expr)
            .withColumn("w", (F.col("c_a") * F.col("c_b")).cast("bigint"))
            .select(
                F.explode(F.array("id_a", "id_b")).alias("x"),
                (F.col("id_a") + F.col("id_b")).alias("ab"),
                "lvl", "w",
            )
            .select("x", (F.col("ab") - F.col("x")).alias("nb"), "lvl", "w")
        )

    sc.setJobDescription("edges nofilter struct")
    timed("edges NO-filter struct explode (noop)", lambda: noop(edges_nofilter_struct()))
    sc.setJobDescription("edges nofilter arith")
    timed("edges NO-filter arith explode (noop)", lambda: noop(edges_nofilter_arith()))

    def agg_from(edges_fn, two_level: bool):
        e = edges_fn()
        if two_level:
            perxl = e.groupBy("x", "lvl").agg(
                F.min("nb").alias("mnb"), F.sum("w").alias("sw")
            )
            perx = perxl.where(F.col("lvl") > 0).groupBy("x").agg(
                *[F.min(F.when(F.col("lvl") >= r, F.col("mnb"))).alias(f"m{r}") for r in ranks],
                *[F.sum(F.when(F.col("lvl") == r, F.col("sw"))).alias(f"s{r}") for r in ranks],
            )
        else:
            perx = e.groupBy("x").agg(
                *[F.min(F.when(F.col("lvl") >= r, F.col("nb"))).alias(f"m{r}") for r in ranks],
                *[F.sum(F.when(F.col("lvl") == r, F.col("w"))).alias(f"s{r}") for r in ranks],
            )
        return perx.agg(
            *[F.sum((F.col(f"m{r}") < F.col("x")).cast("bigint")).alias(f"lost{r}") for r in ranks],
            *[F.sum(f"g{r}".replace("g", "s")).alias(f"g{r}") for r in ranks],
        ).first()

    sc.setJobDescription("agg nofilter struct flat")
    timed("agg NO-filter struct flat", lambda: agg_from(edges_nofilter_struct), n=0 or 3) if False else None
    timed("agg NO-filter struct flat", lambda: agg_from(edges_nofilter_struct, False))
    sc.setJobDescription("agg nofilter arith flat")
    timed("agg NO-filter arith flat", lambda: agg_from(edges_nofilter_arith, False))
    sc.setJobDescription("agg nofilter arith 2lvl")
    timed("agg NO-filter arith two-level", lambda: agg_from(edges_nofilter_arith, True))

    r1 = agg_from(edges_nofilter_struct, False)
    r2 = agg_from(edges_nofilter_arith, False)
    r3 = agg_from(edges_nofilter_arith, True)
    print("struct==arith:", r1 == r2, " flat==2lvl:", r2 == r3, flush=True)
    print(r1.asDict(), flush=True)


if __name__ == "__main__":
    main()
