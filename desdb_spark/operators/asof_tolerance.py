"""Round-8: tolerance-bounded as-of join — the FEATURE-STORE read
semantic (public: point-in-time joins with max staleness in Feast /
Delta feature stores): the latest click at-or-before each purchase
counts only if it is FRESH — within the tolerance window — otherwise
the feature is NULL and the row is flagged stale. Training pipelines
need the flag as much as the value: silently-stale features are the
classic online/offline skew bug.

Scale shape: identical to join_asof's single-window formulation (union
both sides tagged, one shuffle on user_id, running max per partition)
— the tolerance is a post-window codegen predicate, so bounding
staleness costs ZERO extra shuffles vs the unbounded as-of, where a
naive range join (user, ts BETWEEN ts-tol AND ts) would shuffle span
replicas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Max feature staleness: clicks older than this are rejected.
TOL_HOURS = 6


@register(
    "join_asof_tolerance",
    oracle=f"""
        WITH p AS (
            SELECT p.event_id, p.user_id, p.ts,
                   (SELECT max(c.ts) FROM events c
                     WHERE c.user_id = p.user_id
                       AND c.event_type = 'click'
                       AND c.ts <= p.ts) AS last_click_ts
            FROM events p
            WHERE p.event_type = 'purchase'
        )
        SELECT event_id, user_id, ts,
               CASE WHEN last_click_ts >= ts - INTERVAL {TOL_HOURS} HOUR
                    THEN last_click_ts END AS fresh_click_ts,
               CAST(CASE WHEN last_click_ts IS NULL THEN 'never'
                         WHEN last_click_ts >= ts - INTERVAL {TOL_HOURS} HOUR
                         THEN 'fresh' ELSE 'stale'
                    END AS VARCHAR) AS staleness
        FROM p
    """,
    group="asof_tolerance",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a {TOL_HOURS}-hour staleness bound: per
    purchase, the latest prior click if fresh (else NULL) plus the
    three-way staleness class ('fresh' / 'stale' / 'never') — the
    feature-store point-in-time read with skew guard."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_type"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # 'click' < 'purchase' lexically: an equal-ts click sorts into the
    # frame, matching the oracle's c.ts <= p.ts (join_asof convention).
    last = F.col("last_click_ts")
    fresh_bound = F.col("ts") - F.expr(f"INTERVAL {TOL_HOURS} HOURS")
    return (
        tagged.withColumn("last_click_ts", F.max("click_ts").over(w))
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(last >= fresh_bound, last).alias("fresh_click_ts"),
            F.when(last.isNull(), F.lit("never"))
            .when(last >= fresh_bound, F.lit("fresh"))
            .otherwise(F.lit("stale"))
            .alias("staleness"),
        )
    )
