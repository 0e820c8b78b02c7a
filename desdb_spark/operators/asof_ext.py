"""Round-7: forward as-of join — the "next event after" direction.

The backward as-of (operators/joins.py join_asof) answers "the latest
quote at or before this trade"; the forward direction answers "the
first purchase at or after this view" — time-to-conversion, next-ride
matching, SLA-response pairing. Same library kernel
(``asof_join(direction='forward')``): union both sides tagged, ONE
window pass per user — one shuffle on the group key, no range join, no
span materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "join_asof_forward",
    # Oracle: the earliest purchase with p.ts >= v.ts per user, via a
    # correlated min — O(n·m) per user for DuckDB, fine at oracle scale;
    # the Spark side is the single-window-pass formulation.
    oracle="""
        WITH v AS (
            SELECT user_id, ts AS view_ts FROM events
            WHERE event_type = 'view'
        ), p AS (
            SELECT user_id, ts AS purchase_ts FROM events
            WHERE event_type = 'purchase'
        )
        SELECT v.user_id, v.view_ts,
               (SELECT min(p.purchase_ts) FROM p
                WHERE p.user_id = v.user_id
                  AND p.purchase_ts >= v.view_ts) AS next_purchase_ts
        FROM v
    """,
    group="asof_ext",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every view with the user's FIRST purchase at or after it (null if
    none follows) — the time-to-conversion pairing.

    Scale shape: both event streams union into one frame tagged by
    side; a single window ordered by (ts, side-tag) per user carries
    the next-purchase timestamp backward via ``min(...).over(rows
    between current and unbounded following)`` restricted to purchase
    rows — one shuffle on user_id, O(n log n) per user, versus the
    range join's span explosion. Ties (purchase at exactly view ts)
    match, same as pandas.merge_asof / DuckDB ASOF semantics.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    tagged = (
        ev.where(F.col("event_type").isin("view", "purchase"))
        .select(
            "user_id",
            "ts",
            (F.col("event_type") == "purchase").alias("is_p"),
        )
    )
    # Order views BEFORE purchases at identical ts: the frame is
    # [currentRow, unboundedFollowing], so an equal-ts purchase is only
    # visible from the view row if it sorts at-or-after it (mirrors
    # join_asof's backward convention, where the matchable side sorts
    # into the frame). Purchases-first would skip exact-ts conversions.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("is_p").cast("int"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nxt = F.min(F.when(F.col("is_p"), F.col("ts"))).over(w)
    return (
        tagged.withColumn("next_purchase_ts", nxt)
        .where(~F.col("is_p"))
        .select(
            "user_id",
            F.col("ts").alias("view_ts"),
            "next_purchase_ts",
        )
    )
