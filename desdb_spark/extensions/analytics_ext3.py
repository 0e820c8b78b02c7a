"""Round-6 batch-16 distribution drift and association mining.

- Two-sample Kolmogorov–Smirnov: the nonparametric "did the whole
  DISTRIBUTION move" test (vs Welch on the mean, chi-square on
  categories) — D = max |F₁−F₂| over the pooled sample, computed with
  cumulative-count windows; the corpus-drift gate between two sources.
- Market-basket lift (Agrawal & Srikant's association mining, public
  literature): support/confidence/lift for part pairs co-occurring in
  orders — the co-purchase signal behind recommendations and the
  classic example of a pair explosion kept linear by per-basket fanout
  bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: The two document sources whose length distributions the KS op
#: compares (fixture sources are 'src0'..'src19'; these two exist
#: at every SF).
KS_A, KS_B = "src1", "src2"

#: Minimum pair support for basket mining (absolute order count).
MIN_SUPPORT = 3


@register(
    "stat_ks_two_sample",
    oracle=f"""
        WITH pooled AS (
            SELECT n_chars,
                   CASE WHEN source = '{KS_A}' THEN 1 ELSE 0 END AS a,
                   CASE WHEN source = '{KS_B}' THEN 1 ELSE 0 END AS b,
                   doc_id
            FROM documents WHERE source IN ('{KS_A}', '{KS_B}')
        ), counts AS (
            SELECT sum(a) AS na, sum(b) AS nb FROM pooled
        ), cdf AS (
            SELECT n_chars,
                   sum(a) OVER (ORDER BY n_chars) AS ca,
                   sum(b) OVER (ORDER BY n_chars) AS cb
            FROM pooled
        )
        SELECT CAST((SELECT na FROM counts) AS BIGINT) AS n_a,
               CAST((SELECT nb FROM counts) AS BIGINT) AS n_b,
               round(max(abs(
                   CAST(ca AS DOUBLE) / (SELECT na FROM counts)
                   - CAST(cb AS DOUBLE) / (SELECT nb FROM counts))), 6)
                   AS ks_d
        FROM cdf
    """,
    group="analytics_ext3",
)
def stat_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic between two sources' document-length
    distributions: D = max |F_a − F_b| over the pooled ordered sample,
    one cumulative-count pass per side.

    Tie handling is the correctness subtlety: the cumulative windows
    order by the VALUE ALONE, and both engines' default window frame is
    RANGE — every row in a tie group reads the sum over ALL its peers,
    i.e. the post-tie CDF at that value (bisect_right semantics). A
    total (value, doc_id) order would evaluate the difference mid-tie
    and OVERSHOOT the true supremum whenever the samples share a value
    (found by the hypothesis property test; e.g. [5,5,7] vs [5,9] gave
    0.667 instead of the true 0.5). RANGE peers also make the result
    deterministic without any tie-break — peers share one value.

    Scale shape: the pooled sort is ONE window over the two samples
    being compared (not the corpus); at billions of rows per sample
    you'd compute D on the engines' quantile sketches instead — the
    statistic only needs the CDFs, which is exactly what a KLL/t-digest
    summarizes. Counts are exact integers; the division happens once
    per row in identical order on both engines, and D rounds at 6 dp.
    """
    d = load_table(spark, sf_dir, "documents").where(
        F.col("source").isin(KS_A, KS_B)
    )
    pooled = d.select(
        "n_chars",
        "doc_id",
        F.when(F.col("source") == KS_A, 1).otherwise(0).alias("a"),
        F.when(F.col("source") == KS_B, 1).otherwise(0).alias("b"),
    )
    wall = W.partitionBy()
    na = F.sum("a").over(wall).cast("double")
    nb = F.sum("b").over(wall).cast("double")
    wc = W.orderBy("n_chars")
    cdf = pooled.select(
        na.alias("na"),
        nb.alias("nb"),
        (F.sum("a").over(wc).cast("double") / na).alias("fa"),
        (F.sum("b").over(wc).cast("double") / nb).alias("fb"),
    )
    return cdf.agg(
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
        F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_d"),
    )


@register(
    "analytics_basket_lift",
    oracle=f"""
        WITH baskets AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), n_orders AS (
            SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n FROM baskets
        ), item AS (
            SELECT l_partkey, CAST(count(*) AS DOUBLE) AS supp
            FROM baskets GROUP BY l_partkey
        ), pairs AS (
            SELECT a.l_partkey AS x, b.l_partkey AS y,
                   CAST(count(*) AS BIGINT) AS pair_supp
            FROM baskets a JOIN baskets b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY a.l_partkey, b.l_partkey
            HAVING count(*) >= {MIN_SUPPORT}
        )
        SELECT p.x, p.y, p.pair_supp,
               round(p.pair_supp * (SELECT n FROM n_orders)
                     / (ix.supp * iy.supp), 4) AS lift
        FROM pairs p
        JOIN item ix ON p.x = ix.l_partkey
        JOIN item iy ON p.y = iy.l_partkey
        ORDER BY lift DESC, p.x, p.y LIMIT 25
    """,
    group="analytics_ext3",
)
def analytics_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 part pairs by lift (P(x,y)/(P(x)·P(y))) among pairs
    co-ordered at least {MIN_SUPPORT} times — association mining over
    order baskets, the co-purchase signal.

    Scale shape: pair generation is the in-basket self-join — fanout
    C(basket,2) per ORDER (TPC-H baskets hold ~4 parts → ~6 pairs), so
    the pair stream is linear in orders, not parts²; the support
    HAVING prunes before the lift joins, and the two item-support
    joins attach to the already-thresholded pair table (small). The
    order count folds in as a driver scalar. This is a-priori's first
    pass; longer itemsets iterate the same join against surviving
    pairs.
    """
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = float(baskets.select("l_orderkey").distinct().count())
    item = baskets.groupBy("l_partkey").agg(
        F.count("*").cast("double").alias("supp")
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y"))
        .agg(F.count("*").cast("bigint").alias("pair_supp"))
        .where(F.col("pair_supp") >= MIN_SUPPORT)
    )
    ix = item.select(F.col("l_partkey").alias("x"), F.col("supp").alias("sx"))
    iy = item.select(F.col("l_partkey").alias("y"), F.col("supp").alias("sy"))
    return (
        pairs.join(ix, "x")
        .join(iy, "y")
        .select(
            "x",
            "y",
            "pair_supp",
            F.round(
                F.col("pair_supp") * F.lit(n_orders) / (F.col("sx") * F.col("sy")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "x", "y")
        .limit(25)
    )
