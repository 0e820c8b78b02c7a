"""Extended aggregation operators beyond SURVEY.md §2B: pivot, exact
percentiles/median, ordered string aggregation.

Provenance: the reference's arbitrary-SQL surface (A1) exposes Oracle's
full aggregate vocabulary; these are the most-used shapes not already in
the §2B inventory.

Scale notes: pivot compiles to a single hash aggregation whose values are
the (small, explicit) pivot domain — always pass the domain list, or Spark
runs an extra distinct scan to discover it. Exact percentiles require a
per-group sort (Spark buffers group values); at 100 TB use
``percentile_approx`` (t-digest-style sketch, fixed memory) — same query
shape, sketch column swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "agg_pivot",
    oracle="""
        SELECT l_returnflag,
               round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2) AS qty_F,
               round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2) AS qty_O
        FROM lineitem
        GROUP BY l_returnflag
    """,
    group="aggregates",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (explicit domain → one-pass hash agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return p.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_F"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_O"),
    )


@register(
    "agg_percentiles",
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 4) AS qty_p50,
               round(quantile_cont(l_quantity, 0.9), 4) AS qty_p90,
               round(median(l_extendedprice), 4) AS price_median
        FROM lineitem
        GROUP BY l_returnflag
    """,
    group="aggregates",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + median per group.

    Spark ``percentile`` and DuckDB ``quantile_cont`` both use linear
    interpolation — values match exactly; rounded anyway per §5.3.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("qty_p50"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("qty_p90"),
        F.round(F.median("l_extendedprice"), 4).alias("price_median"),
    )


@register(
    "agg_string_concat",
    oracle="""
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation
        GROUP BY n_regionkey
    """,
    group="aggregates",
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG shape).

    ``collect_list`` order is nondeterministic under parallelism, so the
    engine sorts the collected array before joining — the only
    deterministic form at any scale.
    """
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )
