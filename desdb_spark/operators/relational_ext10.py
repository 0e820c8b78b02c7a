"""Relational surface extensions, round 5 batch 5: null-preserving
unnest, edit-distance fuzzy matching, and sketched percentiles — three
semantics corners (outer-join unnest rows, fuzzy string joins, bounded-
error quantiles) that round out the §2B-adjacent surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "udtf_explode_outer_nulls",
    oracle="""
        WITH src AS (
            SELECT vec_id,
                   CASE WHEN vec_id % 10 = 0 THEN []
                        ELSE embedding[1:3] END AS arr
            FROM embeddings),
        outered AS (
            SELECT vec_id,
                   unnest(CASE WHEN len(arr) = 0
                               THEN [CAST(NULL AS FLOAT)] ELSE arr END) AS x
            FROM src)
        SELECT vec_id, count(*) AS n_rows, count(x) AS n_values,
               round(sum(CAST(x AS DOUBLE)), 4) AS sum_x
        FROM outered
        GROUP BY vec_id
    """,
    group="relational_ext10",
)
def udtf_explode_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving unnest (``explode_outer``): rows whose array is
    empty survive as a single null-element row instead of vanishing —
    the LEFT JOIN of table-function land. Every 10th vector's array is
    emptied to make the semantics observable; the per-vector row/value
    counts expose exactly which engine dropped what.

    Scale shape: explode_outer is a generator in the scan stage (no
    shuffle to fan out); the aggregate shuffles one row per vector.
    DuckDB has no outer unnest, so the oracle models it explicitly with
    a [NULL] substitution — a correct-by-construction cross-engine
    definition of the semantics.
    """
    e = load_table(spark, sf_dir, "embeddings")
    arr = F.when(F.col("vec_id") % 10 == 0, F.array().cast("array<float>")).otherwise(
        F.slice("embedding", 1, 3)
    )
    return (
        e.select("vec_id", F.explode_outer(arr).alias("x"))
        .groupBy("vec_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("x").alias("n_values"),
            F.round(F.sum(F.col("x").cast("double")), 4).alias("sum_x"),
        )
    )


@register(
    "scalar_edit_distance",
    oracle="""
        WITH pairs AS (
            SELECT a.p_partkey AS key_a, a.p_name AS name_a,
                   b.p_name AS name_b
            FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1)
        SELECT key_a, levenshtein(name_a, name_b) AS edit_dist,
               CAST(length(name_a) AS BIGINT) AS len_a,
               CAST(length(name_b) AS BIGINT) AS len_b
        FROM pairs
    """,
    group="relational_ext10",
)
def scalar_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance between adjacent part names — the fuzzy
    string-match scalar that entity-resolution pipelines thread through
    blocked candidate pairs (here the block is the trivial key+1 join;
    real pipelines block with LSH/prefix filters, extensions/dedup.py).

    Scale shape: the distance is a JVM scalar evaluated per joined row
    — cost rides the candidate count. Levenshtein is O(len²) per pair:
    at 100 TB it belongs AFTER a cheap blocking join (as here), never
    inside the join condition where it would force a cross product.
    """
    p = load_table(spark, sf_dir, "part")
    a = p.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"))
    b = p.select((F.col("p_partkey") - 1).alias("key_a"), F.col("p_name").alias("name_b"))
    return a.join(b, "key_a").select(
        "key_a",
        F.levenshtein("name_a", "name_b").cast("bigint").alias("edit_dist"),
        F.length("name_a").cast("bigint").alias("len_a"),
        F.length("name_b").cast("bigint").alias("len_b"),
    )


@register("agg_approx_percentile", group="relational_ext10")  # rows-only: sketch
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (p50/p90/p99 of order totals per status)
    via Spark's bounded-error quantile sketch — the scale path when the
    exact-percentile shuffle (agg_percentiles) is too expensive; sketch
    internals are engine-specific, so this is rows-only by design, with
    the within-error-bound property asserted against the exact
    percentiles in tests/test_extensions.py.

    Scale shape: the sketch is a fixed-size mergeable summary built in
    the partial aggregate — shuffle cost is O(groups × sketch), not
    O(rows), the same economics as approx_count_distinct.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000).alias("pcts"),
        F.count("*").alias("n_orders"),
    ).select(
        "o_orderstatus",
        F.round(F.element_at("pcts", 1), 2).alias("p50"),
        F.round(F.element_at("pcts", 2), 2).alias("p90"),
        F.round(F.element_at("pcts", 3), 2).alias("p99"),
        "n_orders",
    )


@register(
    "agg_percentile_disc",
    oracle="""
        SELECT o_orderstatus,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS p99,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
    """,
    group="relational_ext10",
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete percentiles — the hash-checkable twin of
    ``agg_approx_percentile`` (VERDICT r5 item 9): percentile_disc picks
    an actual data value at each rank, so both engines return the
    IDENTICAL double with no interpolation arithmetic to drift, and the
    sketch op's error bound has an externally-verified exact anchor on
    the same (orders × status) shape.

    Scale shape: exact distributed percentiles sort within each group's
    partitions under a single shuffle on the group key — O(rows) exchange
    vs the sketch's O(groups); that cost ordering is the point of keeping
    both ops registered.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_pd_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS p99,
               count(*) AS n_orders
        FROM _pd_orders
        GROUP BY o_orderstatus
        """
    )
