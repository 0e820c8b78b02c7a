"""Round-7: DAU / WAU / stickiness — the product-engagement staple.

The naive trailing-window distinct (``user IN days d−6..d``) is a range
join, which Spark can only plan as a nested-loop — banned fleet-wide.
The scale-correct formulation inverts it: each DISTINCT (day, user)
pair CONTRIBUTES to exactly 7 target days, so explode the pair into its
7 targets (a Generate — no join at all) and count distinct users per
target day. Fanout runs on the deduplicated day-user grain (bounded by
|users|·|days|), never on raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Trailing window width (days) for the WAU side of the ratio.
WINDOW_DAYS = 7


@register(
    "events_dau_wau_stickiness",
    oracle=f"""
        WITH day_users AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                   user_id
            FROM events
        ), dau AS (
            SELECT day, CAST(count(*) AS BIGINT) AS dau FROM day_users
            GROUP BY day
        ), contrib AS (
            SELECT day + CAST(o.off AS INT) AS target_day, user_id
            FROM day_users,
                 unnest(range(0, {WINDOW_DAYS})) AS o(off)
        ), wau AS (
            SELECT target_day AS day,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS wau
            FROM contrib GROUP BY target_day
        )
        SELECT d.day, d.dau, w.wau,
               round(CAST(d.dau AS DOUBLE) / w.wau, 4) AS stickiness
        FROM dau d JOIN wau w ON w.day = d.day
        ORDER BY d.day
    """,
    group="engagement_ext",
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event day: daily active users, trailing-{WINDOW_DAYS}-day
    active users, and the DAU/WAU stickiness ratio.

    Scale shape (module docstring): one distinct on (day, user) — the
    only pass over raw events — then a ×{WINDOW_DAYS} explode on that
    deduplicated grain and a count-distinct per target day; the final
    DAU⋈WAU join is on the tiny per-day frames. The ratio is a single
    division of exact integers. Output restricted to days that actually
    have events (the inner join), so partial leading windows report the
    users genuinely seen.
    """
    ev = load_table(spark, sf_dir, "events")
    day_users = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    ).distinct()
    dau = day_users.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    offsets = F.array(*[F.lit(o) for o in range(WINDOW_DAYS)])
    contrib = day_users.select(
        F.explode(offsets).alias("off"), "day", "user_id"
    ).select(F.expr("date_add(day, off)").alias("day"), "user_id")
    wau = contrib.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 4).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )
