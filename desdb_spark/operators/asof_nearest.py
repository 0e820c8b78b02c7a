"""Round-8e: nearest as-of join — completing the as-of family
(backward operators/joins.py:join_asof, forward asof_ext.py, staleness-
bounded asof_tolerance.py) with the third public direction
(pandas.merge_asof direction='nearest'): pair each view with the
temporally CLOSEST purchase by the same user, either side, ties to the
backward match (pandas' rule).

Scale shape: the same single-window-pass kernel as the other family
members, run once in each direction over ONE tagged union frame — the
two window functions share partitioning (user_id) and ordering (ts,
side-tag), so Catalyst plans one shuffle + one sort for both. The
nearest pick is then a per-row CASE on exact integer microsecond gaps.
No range join, no span explosion — O(n log n) per user at any scale.

Equal-ts purchases sort BEFORE views (the backward convention, matching
join_asof): they surface through the backward arm with gap 0, which the
tie rule then always prefers — so the forward frame's not seeing them
is immaterial, and both engines agree without a second sort order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "join_asof_nearest",
    # Oracle: correlated max/min per direction, then the same tie CASE
    # on exact microsecond gaps — O(n·m) per user, fine at oracle scale.
    oracle="""
        WITH v AS (
            SELECT user_id, ts AS view_ts FROM events
            WHERE event_type = 'view'
        ), p AS (
            SELECT user_id, ts AS purchase_ts FROM events
            WHERE event_type = 'purchase'
        ), cand AS (
            SELECT v.user_id, v.view_ts,
                   (SELECT max(p.purchase_ts) FROM p
                    WHERE p.user_id = v.user_id
                      AND p.purchase_ts <= v.view_ts) AS prev_ts,
                   (SELECT min(p.purchase_ts) FROM p
                    WHERE p.user_id = v.user_id
                      AND p.purchase_ts > v.view_ts) AS next_ts
            FROM v
        )
        SELECT user_id, view_ts,
               CASE
                   WHEN prev_ts IS NULL THEN next_ts
                   WHEN next_ts IS NULL THEN prev_ts
                   WHEN epoch_us(view_ts) - epoch_us(prev_ts)
                        <= epoch_us(next_ts) - epoch_us(view_ts)
                       THEN prev_ts
                   ELSE next_ts
               END AS nearest_purchase_ts,
               CASE
                   WHEN prev_ts IS NULL AND next_ts IS NULL THEN NULL
                   WHEN next_ts IS NULL
                        OR (prev_ts IS NOT NULL
                            AND epoch_us(view_ts) - epoch_us(prev_ts)
                                <= epoch_us(next_ts) - epoch_us(view_ts))
                       THEN CAST(epoch_us(view_ts) - epoch_us(prev_ts)
                                 AS BIGINT)
                   ELSE CAST(epoch_us(next_ts) - epoch_us(view_ts)
                             AS BIGINT)
               END AS gap_us
        FROM cand
    """,
    group="asof_nearest",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every view with the user's temporally closest purchase (either
    direction; equal-gap ties take the earlier/backward purchase, the
    pandas merge_asof 'nearest' rule) plus the exact gap in integer
    microseconds; both null when the user never purchases."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.where(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").alias("is_p"),
    )
    # Purchases sort before views at equal ts (backward convention);
    # both windows share this one (partition, order) → one shuffle+sort.
    order = [F.col("ts"), F.col("is_p").cast("int").desc()]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    p_ts = F.when(F.col("is_p"), F.col("ts"))
    # materialize each window result ONCE, then derive — keeps the plan
    # at exactly two window aggregates over the shared sort
    winged = tagged.select(
        "user_id",
        "ts",
        "is_p",
        F.unix_micros(F.max(p_ts).over(wb)).alias("prev_us"),
        F.unix_micros(F.min(p_ts).over(wf)).alias("next_us"),
    )
    prev_us, next_us = F.col("prev_us"), F.col("next_us")
    view_us = F.unix_micros(F.col("ts"))
    backward_wins = prev_us.isNotNull() & (
        next_us.isNull() | (view_us - prev_us <= next_us - view_us)
    )
    nearest_us = F.when(backward_wins, prev_us).otherwise(next_us)
    return (
        winged.select(
            "user_id",
            "ts",
            "is_p",
            nearest_us.alias("nearest_us"),
            F.when(backward_wins, view_us - prev_us)
            .otherwise(next_us - view_us)
            .cast("bigint")
            .alias("gap_us"),
        )
        .where(~F.col("is_p"))
        .select(
            "user_id",
            F.col("ts").alias("view_ts"),
            F.timestamp_micros(F.col("nearest_us")).alias(
                "nearest_purchase_ts"
            ),
            "gap_us",
        )
    )
