"""Round-7: bot-likeness scoring from inter-arrival regularity — the
traffic-quality filter a web-scale corpus pipeline runs before trusting
engagement signals. Humans are bursty; schedulers are metronomes: a
user whose event gaps have a LOW coefficient of variation (σ/μ) at
volume is overwhelmingly automated. Markov entropy (markov_ext) scores
WHAT a user does; this scores WHEN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Minimum gap count for a stable CV estimate, and the report size.
MIN_GAPS = 20
TOP_N = 50


@register(
    "events_bot_regularity_score",
    # Gaps in integer MILLISECONDS (µs²-sums would overflow BIGINT at
    # hour-scale gaps; ms² × realistic volumes stay < 2⁶³). CV from
    # exact integer sufficient stats (Σg, Σg², k) — single divisions of
    # exact sums, no accumulation-order exposure.
    oracle=f"""
        WITH ordered AS (
            SELECT user_id, epoch_ms(ts) AS t,
                   lag(epoch_ms(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        ), gaps AS (
            SELECT user_id, t - prev AS g FROM ordered WHERE prev IS NOT NULL
        ), stats AS (
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(sum(g) AS BIGINT) AS s1,
                   CAST(sum(g * g) AS BIGINT) AS s2
            FROM gaps GROUP BY user_id
        )
        SELECT user_id, n_gaps,
               CAST(round(CAST(s1 AS DOUBLE) / n_gaps, 0) AS BIGINT)
                   AS mean_gap_ms,
               round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1
                           / n_gaps) / (n_gaps - 1))
                     / (CAST(s1 AS DOUBLE) / n_gaps), 4) AS cv
        FROM stats
        WHERE n_gaps >= {MIN_GAPS} AND s1 > 0
        ORDER BY cv, user_id
        LIMIT {TOP_N}
    """,
    group="bot_ext",
)
def events_bot_regularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {TOP_N} most metronomic users: per user with ≥ {MIN_GAPS}
    event gaps, the mean gap and the coefficient of variation of gaps,
    ascending (lowest CV = most bot-like).

    Scale shape: one window pass per user computes gaps (shuffle on
    user_id, the same partitioning every per-user op reuses), then a
    three-integer sufficient-stats aggregate; the CV is two divisions
    of exact sums. Top-{TOP_N} is a TakeOrderedAndProject. At 100 TB
    the gap window and the aggregate pipeline into one stage pair —
    nothing rescans, and the output is |users|-bounded before the
    limit.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.expr("unix_micros(ts) div 1000")
    gaps = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("g", t - F.lag(t).over(w))
        .where(F.col("g").isNotNull())
    )
    stats = gaps.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.sum("g").cast("bigint").alias("s1"),
        F.sum(F.col("g") * F.col("g")).cast("bigint").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_gaps")
    sd = F.sqrt(
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n_gaps"))
        / (F.col("n_gaps") - 1)
    )
    return (
        stats.where((F.col("n_gaps") >= MIN_GAPS) & (F.col("s1") > 0))
        .select(
            "user_id",
            "n_gaps",
            F.round(mean, 0).cast("bigint").alias("mean_gap_ms"),
            F.round(sd / mean, 4).alias("cv"),
        )
        .orderBy("cv", "user_id")
        .limit(TOP_N)
    )
