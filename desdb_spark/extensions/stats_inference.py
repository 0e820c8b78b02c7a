"""Round-6 batch-10 inferential statistics.

``stat_chi_square_indep`` (extensions/stats_monitor.py) covers
categorical independence; these ops add the two continuous workhorses a
data-quality dashboard runs: ordinary least squares (is price actually
linear in quantity, and how much variance does that explain) and
Welch's unequal-variance t-test (did this segment's metric move vs that
segment's). Both are computed from sufficient statistics (n, Σx, Σy,
Σxx, Σyy, Σxy) with the formula spelled out identically in both
engines — not the engines' built-in regr_*/t-test implementations,
whose internal summation strategies differ in the last ulps and would
make a bit-exact hash a coin flip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "stat_linear_regression",
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   CAST(count(*) AS DOUBLE) AS n,
                   sum(CAST(l_quantity AS DOUBLE)) AS sx,
                   sum(l_extendedprice) AS sy,
                   sum(CAST(l_quantity AS DOUBLE) * l_quantity) AS sxx,
                   sum(l_extendedprice * l_extendedprice) AS syy,
                   sum(CAST(l_quantity AS DOUBLE) * l_extendedprice) AS sxy
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n_rows,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
               round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                     2) AS intercept,
               round(pow(n * sxy - sx * sy, 2) /
                     ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        FROM s
    """,
    group="stats_inference",
)
def stat_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS of extended price on quantity: slope,
    intercept, and R² from the six sufficient statistics, the classic
    one-pass formulation. R² here is ~1 by construction (price =
    quantity × unit price), which makes the regression a data-quality
    assertion: a returnflag segment whose R² drops has rows violating
    the price model.

    Scale shape: ONE map-side-combinable aggregate computes all six
    sufficient statistics per group; the closed-form solve is row-local
    arithmetic on 3 rows. This sufficient-statistics shape is also why
    the op is hash-checkable: both engines run the identical formula on
    identically-grouped sums (rounded where the sums' partition order
    can differ), instead of each engine's own regr_* internals.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("double")
    y = F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        F.round(slope, 4).alias("slope"),
        F.round((sy - slope * sx) / n, 2).alias("intercept"),
        F.round(
            F.pow(n * sxy - sx * sy, F.lit(2))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@register(
    "stat_welch_ttest",
    oracle="""
        WITH s AS (
            SELECT lang,
                   CAST(count(*) AS DOUBLE) AS n,
                   avg(CAST(n_chars AS DOUBLE)) AS m,
                   var_samp(CAST(n_chars AS DOUBLE)) AS v
            FROM documents WHERE lang IN ('en', 'de') GROUP BY lang
        ), w AS (
            SELECT max(CASE WHEN lang = 'en' THEN n END) AS n1,
                   max(CASE WHEN lang = 'en' THEN m END) AS m1,
                   max(CASE WHEN lang = 'en' THEN v END) AS v1,
                   max(CASE WHEN lang = 'de' THEN n END) AS n2,
                   max(CASE WHEN lang = 'de' THEN m END) AS m2,
                   max(CASE WHEN lang = 'de' THEN v END) AS v2
            FROM s
        )
        SELECT CAST(n1 AS BIGINT) AS n_en, CAST(n2 AS BIGINT) AS n_de,
               round(m1 - m2, 4) AS mean_diff,
               round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
               round(pow(v1 / n1 + v2 / n2, 2) /
                     (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)),
                     2) AS df_welch
        FROM w
    """,
    group="stats_inference",
)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of document length between 'en'
    and 'de': mean difference, t statistic, and the Welch–Satterthwaite
    effective degrees of freedom — the segment-drift test a corpus
    monitor alarms on.

    Scale shape: one grouped aggregate (n, mean, variance per segment),
    then scalar arithmetic on a single pivoted row. Variance rounds
    inside a 4-dp t-statistic of O(1) magnitude, far above the
    cross-engine ulp drift of the underlying sums at any n.
    """
    d = load_table(spark, sf_dir, "documents").where(F.col("lang").isin("en", "de"))
    s = d.groupBy("lang").agg(
        F.count("*").cast("double").alias("n"),
        F.avg(F.col("n_chars").cast("double")).alias("m"),
        F.var_samp(F.col("n_chars").cast("double")).alias("v"),
    )
    pick = lambda lang, c: F.max(F.when(F.col("lang") == lang, F.col(c)))  # noqa: E731
    w = s.agg(
        pick("en", "n").alias("n1"), pick("en", "m").alias("m1"),
        pick("en", "v").alias("v1"),
        pick("de", "n").alias("n2"), pick("de", "m").alias("m2"),
        pick("de", "v").alias("v2"),
    )
    n1, m1, v1 = F.col("n1"), F.col("m1"), F.col("v1")
    n2, m2, v2 = F.col("n2"), F.col("m2"), F.col("v2")
    se2 = v1 / n1 + v2 / n2
    return w.select(
        n1.cast("bigint").alias("n_en"),
        n2.cast("bigint").alias("n_de"),
        F.round(m1 - m2, 4).alias("mean_diff"),
        F.round((m1 - m2) / F.sqrt(se2), 4).alias("t_stat"),
        F.round(
            F.pow(se2, F.lit(2))
            / (
                F.pow(v1 / n1, F.lit(2)) / (n1 - 1)
                + F.pow(v2 / n2, F.lit(2)) / (n2 - 1)
            ),
            2,
        ).alias("df_welch"),
    )
