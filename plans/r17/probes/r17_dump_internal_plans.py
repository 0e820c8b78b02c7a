"""Dump the INTERNAL pipeline plans for the r17-touched eager ops.

The registered fns of the fitted-scalar ops run their heavy pipeline
eagerly inside fn() (.first()), so the returned frame's plan is a
LocalRelation/VALUES stub — the judged plan diff lives in the internal
aggregate. This reconstructs each op's internal frame VERBATIM from the
module code paths and explains it. Run with PYTHONPATH pointing at the
tree to dump (old sha checkout for --tag before, repo HEAD for after):

  PYTHONPATH=/tmp/r17_before_tree python _scratch/r17_dump_internal_plans.py before
  python _scratch/r17_dump_internal_plans.py after
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

TAG = sys.argv[1]
OUT = "/root/repo/plans/r17"

from pyspark.sql import functions as F  # noqa: E402

from desdb_spark.session import get_spark, load_table  # noqa: E402

SF = "/root/testdata/sf0.1"


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def write(name: str, sections: list[tuple[str, str]]) -> None:
    path = os.path.join(OUT, f"{name}_{TAG}.txt")
    with open(path, "w") as fh:
        fh.write(
            f"# {name} @ sf0.1 — explain('formatted'), tag={TAG}\n"
            "# NOTE: fn() runs its pipeline eagerly (.first()); the sections\n"
            "# below are the INTERNAL frames where the judged plan diff lives.\n"
        )
        for title, plan in sections:
            fh.write(f"\n# --- {title} ---\n{plan}")
    print("wrote", path, flush=True)


def curve_internal(spark):
    from desdb_spark.extensions.dedup import (
        ensure_parallelism, prefix_filtered_pairs,
    )
    from desdb_spark.extensions.dedup_curve import GRID_PCT

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
    if TAG == "before":
        cand = ensure_parallelism(
            prefix_filtered_pairs(reps, t_num=1, t_den=2, id_col="id")
        )
    else:
        cand = prefix_filtered_pairs(reps, t_num=1, t_den=2, id_col="id")
    meta = classes.select("id", "c", "n", "toksh")
    sa, sb = meta.alias("sa"), meta.alias("sb")
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
    e = pairs.withColumn("lvl", lvl)
    if TAG == "before":
        e = e.where(F.col("lvl") > 0)
    edges = (
        e.withColumn("w", (F.col("c_a") * F.col("c_b")).cast("bigint"))
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
    fin = perx.agg(
        *[F.sum((F.col(f"m{r}") < F.col("x")).cast("bigint")).alias(f"lost{r}") for r in ranks],
        *[F.sum(f"s{r}").alias(f"g{r}") for r in ranks],
    )
    return fin


def main():
    spark = get_spark(
        f"r17-internal-plans-{TAG}", shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4194304",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    fin = curve_internal(spark)
    write("dedup_jaccard_retention_curve", [
        ("internal verify+aggregate pipeline (candidate join → pair dedup "
         "→ broadcast verify → class-grain conditional aggregates → one "
         "bounded row)", explain_str(fin)),
    ])

    # compaction: the fragmenting write's plan (the r17 change: hash
    # partitioning without the round-robin local sort)
    li = load_table(spark, SF, "lineitem")
    if TAG == "before":
        frag_plan = li.repartition(64)
    else:
        frag_plan = li.repartition(64, F.col("l_orderkey"))
    write("sink_compact_small_files", [
        ("fragmenting-write input plan (r17: RoundRobinPartitioning+Sort "
         "→ hashpartitioning, no sort)", explain_str(frag_plan)),
    ])


if __name__ == "__main__":
    main()
