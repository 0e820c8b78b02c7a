"""Round-6 batch-9 catalog statistics and skew diagnostics.

The optimizer-facing side of a warehouse: ANALYZE TABLE-style column
statistics (null fraction, NDV, min/max, average width — what Spark's
CBO reads from the catalog and what layout tools like
sources/layout_ext.py consume for bounds), and the join-key skew
profile that decides whether a planned join needs salting
(operators/joins_ext.py) or AQE skew splitting BEFORE it runs, rather
than after it straggles.

Reference parity: desdb A4 exposed ``describe`` (mapped at
operators/scans.py:67 as schema_describe); these ops are the
statistics depth behind that surface. Both are exact and
hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "diag_column_stats",
    oracle="""
        SELECT * FROM (
          SELECT 'o_custkey' AS col,
                 CAST(count(*) - count(o_custkey) AS BIGINT) AS n_nulls,
                 CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv,
                 CAST(min(o_custkey) AS VARCHAR) AS min_val,
                 CAST(max(o_custkey) AS VARCHAR) AS max_val
          FROM orders
          UNION ALL
          SELECT 'o_orderstatus',
                 CAST(count(*) - count(o_orderstatus) AS BIGINT),
                 CAST(count(DISTINCT o_orderstatus) AS BIGINT),
                 min(o_orderstatus), max(o_orderstatus)
          FROM orders
          UNION ALL
          SELECT 'o_totalprice',
                 CAST(count(*) - count(o_totalprice) AS BIGINT),
                 CAST(count(DISTINCT o_totalprice) AS BIGINT),
                 CAST(round(min(o_totalprice), 2) AS VARCHAR),
                 CAST(round(max(o_totalprice), 2) AS VARCHAR)
          FROM orders
          UNION ALL
          SELECT 'o_orderdate',
                 CAST(count(*) - count(o_orderdate) AS BIGINT),
                 CAST(count(DISTINCT o_orderdate) AS BIGINT),
                 CAST(min(o_orderdate) AS VARCHAR),
                 CAST(max(o_orderdate) AS VARCHAR)
          FROM orders
        )
    """,
    group="stats_catalog",
)
def diag_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style exact column statistics for four orders columns of
    different types: null count, exact NDV, min/max (stringified so one
    report schema covers numeric/string/date columns — the catalog-table
    convention).

    Scale shape: ONE scan computes all four columns' null counts and
    min/max as map-side-combinable partials; the exact NDVs each shuffle
    their distinct values. At 100 TB you'd flip exact NDV to
    approx_count_distinct (the HLL sketch this registry also ships) and
    keep everything else identical — exact here so the op stays
    hash-checkable. Stats power the CBO (join reordering, broadcast
    decisions) and the Z-order layout bounds.
    """
    o = load_table(spark, sf_dir, "orders")

    def stats(col: str, render) -> DataFrame:
        return o.agg(
            F.lit(col).alias("col"),
            (F.count("*") - F.count(col)).cast("bigint").alias("n_nulls"),
            F.count_distinct(F.col(col)).cast("bigint").alias("ndv"),
            render(F.min(col)).cast("string").alias("min_val"),
            render(F.max(col)).cast("string").alias("max_val"),
        )

    ident = lambda c: c  # noqa: E731
    money = lambda c: F.round(c, 2)  # noqa: E731
    return (
        stats("o_custkey", ident)
        .unionAll(stats("o_orderstatus", ident))
        .unionAll(stats("o_totalprice", money))
        .unionAll(stats("o_orderdate", ident))
    )


@register(
    "diag_join_key_skew",
    oracle="""
        WITH per_key AS (
            SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c
            FROM lineitem GROUP BY l_orderkey
        ), agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(sum(c) AS BIGINT) AS n_rows,
                   CAST(max(c) AS BIGINT) AS max_rows,
                   CAST(sum(CASE WHEN c >= 7 THEN c ELSE 0 END) AS BIGINT)
                       AS heavy_rows
            FROM per_key
        )
        SELECT n_keys, n_rows, max_rows,
               round(CAST(max_rows AS DOUBLE) * n_keys / n_rows, 4)
                   AS skew_factor,
               round(CAST(heavy_rows AS DOUBLE) / n_rows, 4)
                   AS heavy_share
        FROM agg
    """,
    group="stats_catalog",
)
def diag_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew profile of lineitem's join key: key count, row
    count, the hottest key's row count, the skew factor (hottest key ÷
    mean key — 1.0 is perfectly uniform; AQE's skew-join threshold
    reasons in exactly these units), and the share of rows on keys at or
    past 7 rows. This is the number you read BEFORE deciding between a
    plain shuffle join, AQE skew splitting, or explicit salting
    (operators/joins_ext.py salted_join).

    Scale shape: per-key counts are one map-side-combinable groupBy;
    the profile reduces those partials to one row. Cost ∝ distinct
    keys, never rows² — cheap enough to run as a pre-flight check on
    any planned 100 TB join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count("*").alias("c"))
    agg = per_key.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max("c").cast("bigint").alias("max_rows"),
        F.sum(F.when(F.col("c") >= 7, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("heavy_rows"),
    )
    return agg.select(
        "n_keys",
        "n_rows",
        "max_rows",
        F.round(
            F.col("max_rows").cast("double") * F.col("n_keys") / F.col("n_rows"), 4
        ).alias("skew_factor"),
        F.round(F.col("heavy_rows").cast("double") / F.col("n_rows"), 4).alias(
            "heavy_share"
        ),
    )


@register(
    "pipeline_curate_end2end",
    oracle="""
        WITH gated AS (
            SELECT *, len(string_split(text, ' ')) AS toks
            FROM documents
            WHERE n_chars BETWEEN 100 AND 500
              AND len(string_split(text, ' ')) >= 20
        ), canon AS (
            SELECT *, md5(lower(trim(text))) AS digest FROM gated
        ), survivors AS (
            SELECT lang, toks, digest,
                   row_number() OVER (PARTITION BY digest
                                      ORDER BY toks DESC, doc_id) AS rk
            FROM canon
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(toks) AS BIGINT) AS n_tokens
        FROM survivors WHERE rk = 1
        GROUP BY lang
    """,
    group="stats_catalog",
)
def pipeline_curate_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as ONE composed plan: length/token
    quality gate → canonical-text exact dedup (md5 of lower/trim) with
    keep-longest survivor selection → per-language corpus report. Each
    stage exists as its own registered operator; this op is the
    integration proof that they COMPOSE into a single Catalyst plan —
    one scan, one digest shuffle, one report aggregation, with the
    quality predicate pushed below everything.

    Scale shape: the gate prunes before the only wide operation (the
    digest window); survivor selection shuffles (digest, toks, doc_id)
    triples, never text payloads after digesting. This is the shape a
    100 TB curation run actually executes — the per-stage ops are its
    unit tests.
    """
    d = load_table(spark, sf_dir, "documents")
    gated = d.withColumn("toks", F.size(F.split("text", " "))).where(
        F.col("n_chars").between(100, 500) & (F.col("toks") >= 20)
    )
    canon = gated.withColumn("digest", F.md5(F.lower(F.trim("text")).cast("binary")))
    from pyspark.sql import Window as W

    w = W.partitionBy("digest").orderBy(F.desc("toks"), "doc_id")
    survivors = canon.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1)
    return survivors.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("n_tokens"),
    )
