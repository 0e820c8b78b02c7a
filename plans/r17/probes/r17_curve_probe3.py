"""r17 probe 3: decompose the retention-curve verify+agg (6.7 s)."""
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
        "r17-curve-probe3",
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
    print("cand rows:", cand.count(), flush=True)

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

    sc.setJobDescription("joins only (no intersect)")
    timed(
        "joins only, no intersect (noop)",
        lambda: noop(
            cand.join(F.broadcast(sa), F.col("id_a") == F.col("sa.id"))
            .join(F.broadcast(sb), F.col("id_b") == F.col("sb.id"))
            .select("id_a", "id_b", F.col("sa.c").alias("c_a"),
                    F.col("sb.c").alias("c_b"),
                    (F.col("sa.n") + F.col("sb.n")).alias("s"))
        ),
    )
    sc.setJobDescription("pairs w/ intersect")
    timed("pairs incl. intersect (noop)", lambda: noop(pairs_df()))

    def edges_df():
        lvl = sum(
            ((100 + p) * F.col("i") >= p * F.col("s")).cast("int") for p in GRID_PCT
        )
        return (
            pairs_df().withColumn("lvl", lvl)
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

    sc.setJobDescription("edges")
    timed("edges explode (noop)", lambda: noop(edges_df()))

    def agg_current():
        perx = edges_df().groupBy("x").agg(
            *[F.min(F.when(F.col("lvl") >= r, F.col("nb"))).alias(f"m{r}") for r in ranks],
            *[F.sum(F.when(F.col("lvl") == r, F.col("w"))).alias(f"s{r}") for r in ranks],
        )
        return perx.agg(
            *[F.sum((F.col(f"m{r}") < F.col("x")).cast("bigint")).alias(f"lost{r}") for r in ranks],
            *[F.sum(f"s{r}").alias(f"g{r}") for r in ranks],
        ).first()

    sc.setJobDescription("agg current (10 conditional)")
    timed("agg current 10-conditional", agg_current)

    def agg_two_level():
        perxl = edges_df().groupBy("x", "lvl").agg(
            F.min("nb").alias("mnb"), F.sum("w").alias("sw")
        )
        perx = perxl.groupBy("x").agg(
            *[F.min(F.when(F.col("lvl") >= r, F.col("mnb"))).alias(f"m{r}") for r in ranks],
            *[F.sum(F.when(F.col("lvl") == r, F.col("sw"))).alias(f"s{r}") for r in ranks],
        )
        return perx.agg(
            *[F.sum((F.col(f"m{r}") < F.col("x")).cast("bigint")).alias(f"lost{r}") for r in ranks],
            *[F.sum(f"s{r}").alias(f"g{r}") for r in ranks],
        ).first()

    sc.setJobDescription("agg two-level (x,lvl)")
    timed("agg two-level (x,lvl) then x", agg_two_level)
    a = agg_current()
    b = agg_two_level()
    print("results equal:", a == b, flush=True)


if __name__ == "__main__":
    main()
