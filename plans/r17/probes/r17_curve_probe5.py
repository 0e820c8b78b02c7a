"""r17 probe 5: live-op phase timing (replicates dedup_jaccard_retention_curve
exactly, with timers between the steps)."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from desdb_spark.extensions.dedup import ensure_parallelism, prefix_filtered_pairs
from desdb_spark.extensions.dedup_curve import GRID_PCT
from desdb_spark.session import get_spark, load_table

SF = "/root/testdata/sf0.1"


def one_pass(spark, tag):
    sc = spark.sparkContext
    t = {}
    t0 = time.perf_counter()
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
    t["classes_ckpt"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    tot = classes.agg(
        F.sum("c").alias("docs"), F.count("*").alias("ncls"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("bigint").alias("within"),
    ).first()
    total, n_classes, within = int(tot.docs), int(tot.ncls), int(tot.within)
    t["scalars"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    reps = classes.select("id", F.concat_ws(" ", "toks").alias("text"))
    cand = prefix_filtered_pairs(reps, t_num=1, t_den=2, id_col="id")
    meta = classes.select("id", "c", "n", "toksh")
    sa = meta.alias("sa")
    sb = meta.alias("sb")
    i = F.size(F.array_intersect("sa.toksh", "sb.toksh"))
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
    ranks = range(1, len(GRID_PCT) + 1)
    edges = (
        pairs.withColumn("lvl", lvl)
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
    t["build_plan"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    sc.setJobDescription(f"{tag} fin")
    fin = perx.agg(
        *[F.sum((F.col(f"m{r}") < F.col("x")).cast("bigint")).alias(f"lost{r}") for r in ranks],
        *[F.sum(f"s{r}").alias(f"g{r}") for r in ranks],
    ).first()
    t["fin_action"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    lost = [int(fin[f"lost{r}"] or 0) for r in ranks]
    gsum = [int(fin[f"g{r}"] or 0) for r in ranks]
    rows = []
    for idx, p in enumerate(GRID_PCT):
        cross = sum(gsum[idx:]) // 2
        rows.append((p, within + cross, (total - n_classes) + lost[idx], n_classes - lost[idx]))
    spark.createDataFrame(
        rows, "pct bigint, n_pairs bigint, n_docs_removed bigint, n_docs_kept bigint"
    ).orderBy("pct").toPandas()
    t["emit"] = time.perf_counter() - t0
    print(tag, {k: round(v, 2) for k, v in t.items()}, "| total",
          round(sum(t.values()), 2), flush=True)


def main():
    spark = get_spark(
        "r17-curve-probe5", shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4194304",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for k in range(4):
        one_pass(spark, f"run{k}")


if __name__ == "__main__":
    main()
