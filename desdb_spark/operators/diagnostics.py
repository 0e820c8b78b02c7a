"""Layout diagnostics, round 5 batch 7: partition-balance and file-layout
introspection — the observability queries an engine operator runs before
blaming a slow job on the engine (the distributed analogue of desdb's
``describe``-style metadata peeking, §2A A4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register("diag_partition_balance", group="diagnostics")  # rows-only: engine-specific
def diag_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-balance report: hash-repartition the fact table on its
    natural join key and measure rows per partition — min/max/avg and
    the skew ratio (max/avg). A ratio ≫ 1 predicts straggler tasks on
    every downstream join/agg using that key; this is the first number
    to pull before reaching for salting (operators/joins_ext) or AQE
    skew tuning.

    Scale shape: one shuffle (the thing being measured) + a counters-only
    aggregate over spark_partition_id. Partition assignment is
    engine-internal, hence rows-only; the report itself is deterministic
    for a fixed key set and partition count.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    n_parts = 32
    per_part = (
        li.repartition(n_parts, "l_orderkey")
        .groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("rows"))
    )
    return per_part.agg(
        F.count("*").alias("n_partitions"),
        F.sum("rows").alias("total_rows"),
        F.min("rows").alias("min_rows"),
        F.max("rows").alias("max_rows"),
        F.round(F.avg("rows"), 2).alias("avg_rows"),
        F.round(F.max("rows") / F.avg("rows"), 4).alias("skew_ratio"),
    )


@register("diag_file_layout", group="diagnostics")  # rows-only: fs-specific
def diag_file_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table file-layout census: rows per underlying file for each fixture
    table — the is-my-table-well-laid-out check. Too few files caps scan
    parallelism (the single-split trap ensure_parallelism works around);
    too many small files drowns the scheduler in task overhead. Both
    pathologies show up here before they show up as slow queries.

    Scale shape: input_file_name() is scan-side metadata; the census is
    one counters-only aggregate per table, unioned. At 100 TB run it per
    table (or from the lake manifest) rather than unioned.
    """
    frames = []
    for name in ("orders", "lineitem", "documents", "events"):
        t = load_table(spark, sf_dir, name)
        frames.append(
            t.withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(F.count("*").alias("rows"))
            .agg(
                F.lit(name).alias("table"),
                F.count("*").alias("n_files"),
                F.sum("rows").alias("total_rows"),
                F.min("rows").alias("min_rows_per_file"),
                F.max("rows").alias("max_rows_per_file"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("table")
