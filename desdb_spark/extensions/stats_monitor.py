"""Statistical-testing and monitoring ops (round 5).

Analyst-side statistics a desdb user computed client-side on fetched
recarrays [desdb:desdb.py result shaping — reconstructed, SURVEY.md §0],
re-expressed as distributed aggregates: a chi-square independence test
and a trailing-window anomaly detector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "stat_chi_square_indep",
    oracle="""
        WITH obs AS (
          SELECT lang, source, CAST(count(*) AS DOUBLE) AS o
          FROM documents GROUP BY lang, source),
        rt AS (SELECT lang, sum(o) AS r FROM obs GROUP BY lang),
        ct AS (SELECT source, sum(o) AS c FROM obs GROUP BY source)
        SELECT round(sum(o * o * (SELECT sum(o) FROM obs) / (r * c))
                     - (SELECT sum(o) FROM obs), 4) AS chi2,
               CAST(((SELECT count(*) FROM rt) - 1)
                    * ((SELECT count(*) FROM ct) - 1) AS BIGINT) AS dof
        FROM obs
        JOIN rt ON obs.lang = rt.lang
        JOIN ct ON obs.source = ct.source
    """,
    group="stats_monitor",
)
def stat_chi_square_indep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence for the lang × source contingency
    table (is language distribution uniform across sources?).

    Uses the identity Σ_all (o−e)²/e = Σ_observed o²/e − N, which makes
    the statistic computable WITHOUT materializing the full cross
    product of categories: empty cells contribute only through N, so no
    langs×sources cross join exists in the plan (the fleet audit bans
    CartesianProduct; the naive formulation needs one). Marginals join
    back as broadcast equi-joins; N and the dof counts are SQL scalar
    subqueries over the already-aggregated cells.

    Scale shape: one groupBy shuffle over (lang × source) cells; every
    later step runs on ~|cells| rows, never re-reading documents.
    """
    d = load_table(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(
        F.count("*").cast("double").alias("o")
    )
    obs.createOrReplaceTempView("chi2_obs")
    return spark.sql(
        """
        WITH rt AS (SELECT lang, sum(o) AS r FROM chi2_obs GROUP BY lang),
        ct AS (SELECT source, sum(o) AS c FROM chi2_obs GROUP BY source)
        SELECT round(sum(o * o * (SELECT sum(o) FROM chi2_obs) / (r * c))
                     - (SELECT sum(o) FROM chi2_obs), 4) AS chi2,
               CAST(((SELECT count(*) FROM rt) - 1)
                    * ((SELECT count(*) FROM ct) - 1) AS BIGINT) AS dof
        FROM chi2_obs obs
        JOIN rt ON obs.lang = rt.lang
        JOIN ct ON obs.source = ct.source
        """
    )


@register(
    "events_windowed_anomaly",
    oracle="""
        WITH hourly AS (
          SELECT event_type, date_trunc('hour', ts) AS h,
                 CAST(count(*) AS DOUBLE) AS n
          FROM events GROUP BY event_type, date_trunc('hour', ts)),
        scored AS (
          SELECT event_type, h, n,
                 avg(n) OVER w AS mu,
                 stddev_samp(n) OVER w AS sd,
                 count(*) OVER w AS n_hist
          FROM hourly
          WINDOW w AS (PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        SELECT event_type, h, CAST(n AS BIGINT) AS n,
               round((n - mu) / sd, 3) AS zscore
        FROM scored
        WHERE n_hist >= 12 AND sd > 0 AND abs((n - mu) / sd) > 2
    """,
    group="stats_monitor",
)
def events_windowed_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: hourly event counts per type,
    z-scored against the previous 24 hours (excluding the current one);
    emit hours beyond 2σ once at least 12 hours of history exist — the
    standard streaming-telemetry alert shape, run in batch.

    Scale shape: the hourly pre-aggregate collapses the event stream to
    |types|×|hours| rows with one shuffle; the trailing frame is a
    bounded ROWS window over that small frame (constant state per row,
    same event_type partitioning — no second shuffle of raw events).
    The guard sd > 0 keeps the division total; ties in z at exactly 2.0
    cannot flap across engines because the comparison happens on the
    unrounded value in both.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").cast("double").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    scored = hourly.select(
        "event_type",
        "h",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
        F.count("*").over(w).alias("n_hist"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return scored.where(
        (F.col("n_hist") >= 12) & (F.col("sd") > 0) & (F.abs(z) > 2)
    ).select(
        "event_type",
        "h",
        F.col("n").cast("bigint").alias("n"),
        F.round(z, 3).alias("zscore"),
    )
