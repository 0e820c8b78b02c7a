"""Round-6 batch-18 weighted median and corpus-level similarity.

- Weighted median: the order statistic where half the WEIGHT (not half
  the rows) lies on each side — the right "typical price" when rows
  carry quantities; computed as the first value whose running weight
  reaches half the total, one cumulative window per group.
- Source-vocabulary Jaccard: which SOURCES are near-duplicates of each
  other (mirror feeds, re-crawls) — the corpus-level analogue of
  document dedup, computed exactly on per-source vocabularies via one
  token-key equi-join (|A∩B| from co-occurrence, |A∪B| by
  inclusion–exclusion), never a source×source×vocab explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "agg_weighted_median",
    oracle="""
        WITH ranked AS (
            SELECT l_returnflag, l_extendedprice AS price,
                   CAST(l_quantity AS BIGINT) AS w,
                   sum(CAST(l_quantity AS BIGINT)) OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ) AS cw,
                   sum(CAST(l_quantity AS BIGINT)) OVER (
                       PARTITION BY l_returnflag) AS tw
            FROM lineitem
        ), hit AS (
            SELECT l_returnflag, price, tw,
                   row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY cw, price) AS rk
            FROM ranked WHERE 2 * cw >= tw
        )
        SELECT l_returnflag,
               CAST(tw AS BIGINT) AS total_weight,
               round(price, 2) AS weighted_median_price
        FROM hit WHERE rk = 1
    """,
    group="aggregates_ext2",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag: the
    smallest price at which the running quantity reaches half the
    group's total quantity (the lower weighted median — a total
    (price, orderkey, linenumber) sort order makes the running sum, and
    therefore the crossing row, identical in both engines).

    Scale shape: one shuffle on the group key; the cumulative window
    and the total-weight window share the same partitioning, and the
    crossing row is found with a filter + per-group row_number — no
    collect of group values (contrast ``median``, which Spark computes
    with an internal sort anyway; the weighted form just makes the
    running sum explicit). At extreme group sizes the same question is
    answered from a weight-annotated quantile sketch.
    """
    li = load_table(spark, sf_dir, "lineitem")
    wg = W.partitionBy("l_returnflag")
    # The cumulative window's ORDER BY must be TOTAL (price alone ties):
    # both engines default to RANGE frames, where peer rows share one
    # cumulative value, so an incomplete order changes which row crosses
    # half-weight. (orderkey, linenumber) breaks every tie identically.
    wc = wg.orderBy("price", "l_orderkey", "l_linenumber")
    ranked = li.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("w"),
    ).select(
        "l_returnflag",
        "price",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wg).alias("tw"),
    )
    hit = ranked.where(2 * F.col("cw") >= F.col("tw")).withColumn(
        "rk", F.row_number().over(wg.orderBy("cw", "price"))
    )
    return hit.where(F.col("rk") == 1).select(
        "l_returnflag",
        F.col("tw").cast("bigint").alias("total_weight"),
        F.round("price", 2).alias("weighted_median_price"),
    )


@register(
    "corpus_source_jaccard",
    oracle="""
        WITH vocab AS (
            SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
            FROM documents
        ), vocab2 AS (
            SELECT source, w FROM vocab WHERE w <> ''
        ), sizes AS (
            SELECT source, CAST(count(*) AS BIGINT) AS sz
            FROM vocab2 GROUP BY source
        ), inter AS (
            SELECT a.source AS src_a, b.source AS src_b,
                   CAST(count(*) AS BIGINT) AS n_common
            FROM vocab2 a JOIN vocab2 b
              ON a.w = b.w AND a.source < b.source
            GROUP BY a.source, b.source
        )
        SELECT i.src_a, i.src_b, i.n_common,
               round(CAST(i.n_common AS DOUBLE)
                     / (sa.sz + sb.sz - i.n_common), 6) AS jaccard
        FROM inter i
        JOIN sizes sa ON i.src_a = sa.source
        JOIN sizes sb ON i.src_b = sb.source
        ORDER BY jaccard DESC, src_a, src_b LIMIT 20
    """,
    group="aggregates_ext2",
)
def corpus_source_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 source pairs by vocabulary Jaccard — the mirror-feed
    detector: two sources sharing most of their vocabulary are
    re-crawls/mirrors and should be deduplicated as SOURCES before any
    document-level pass bothers.

    Scale shape: per-source vocabularies via one DISTINCT projection;
    |A∩B| comes from the token-key equi-join of vocabulary rows (each
    token fans out only to the sources containing it — the inverted-
    index shape again), |A∪B| by inclusion–exclusion from the two
    broadcast-joined sizes. Nothing ever enumerates source×source×vocab;
    with thousands of sources you'd minhash the vocabularies first and
    feed THESE exact Jaccards only to candidate pairs (the same
    two-tier discipline as document dedup).
    """
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count("*").cast("bigint").alias("sz"))
    a, b = vocab.alias("a"), vocab.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("sz").alias("szb"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("sza") + F.col("szb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "src_a", "src_b")
        .limit(20)
    )
