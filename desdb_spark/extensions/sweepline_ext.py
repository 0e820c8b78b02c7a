"""Round-6 batch-13 sweep-line analytics.

"How many intervals are open at each instant" — concurrent shipments,
active sessions, open orders — is the query people instinctively write
as an interval self-join (quadratic) or a calendar×facts join (cross
product with a date spine). The scalable form is the difference array /
sweep line: explode each interval into a +1 event at its start and a −1
at its end, aggregate deltas per time bucket, and take the running sum.
Cost: one explode (2 rows per interval), one small aggregate, one
ordered window over the BUCKETS (days — thousands of rows however many
billions of intervals there are). The rolling-median op rides the same
daily series with an exact small-frame window median — the robust
rolling statistic a monitor prefers over the mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "events_concurrency_curve",
    oracle="""
        WITH iv AS (
            SELECT o.o_orderdate AS s, l.l_shipdate AS e
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ), deltas AS (
            SELECT s AS d, 1 AS delta FROM iv
            UNION ALL
            SELECT e, -1 FROM iv
        ), daily AS (
            SELECT d, CAST(sum(delta) AS BIGINT) AS net FROM deltas GROUP BY d
        ), curve AS (
            SELECT d, net,
                   CAST(sum(net) OVER (ORDER BY d) AS BIGINT) AS in_flight
            FROM daily
        )
        SELECT d, net, in_flight FROM curve
        ORDER BY in_flight DESC, d LIMIT 30
    """,
    group="sweepline_ext",
)
def events_concurrency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 30 peak days of fulfillment concurrency: each lineitem is
    'in flight' from its order's placement date to its ship date; the
    curve counts how many are simultaneously open per day via the
    difference-array sweep (+1 on order, −1 on ship — the ship day
    counts as fulfilled).

    Scale shape: one equi-join builds the interval table (linear — and
    the only join anywhere), then 2 delta rows per interval and a
    per-day aggregate (map-side combinable to ≤ 2·days
    rows per task), then ONE ordered window over the daily series,
    whose cardinality is the calendar, not the data. This is the
    pattern that replaces both the interval self-join and the
    date-spine cross join at 100 TB; the bucketed interval-overlap JOIN
    (operators/joins_ext2.py) is for when you need the matching pairs,
    this is for when you only need the count.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    iv = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderdate").alias("s"), F.col("l_shipdate").alias("e")
    )
    deltas = iv.select(F.col("s").alias("d"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.col("e").alias("d"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").cast("bigint").alias("net"))
    curve = daily.withColumn(
        "in_flight", F.sum("net").over(W.orderBy("d")).cast("bigint")
    )
    return curve.orderBy(F.desc("in_flight"), "d").limit(30)


@register(
    "window_rolling_median",
    oracle="""
        WITH daily AS (
            SELECT o_orderdate AS d, round(sum(o_totalprice), 2) AS rev
            FROM orders GROUP BY o_orderdate
        )
        SELECT d, rev,
               round(median(rev) OVER (
                   ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2)
                   AS med7
        FROM daily
        ORDER BY d
        LIMIT 400
    """,
    group="sweepline_ext",
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row rolling MEDIAN of daily order revenue (first 400 days) —
    the robust trend line a revenue monitor plots instead of a rolling
    mean one fat-finger order can yank around.

    Scale shape: the window runs over the DAILY aggregate (calendar
    cardinality), not raw orders, so the exact in-frame median is a
    7-element sort per row — constant work. Spark's ``median`` refuses
    window frames outright, so the frame median is built from
    ``sort_array(collect_list(...))`` over the frame plus the
    odd/even interpolation — (a+b)/2 is exact IEEE arithmetic over
    identically-rounded daily inputs, so the result hashes against
    DuckDB's native windowed ``median``. At raw-event granularity
    you'd swap in approx_percentile over the frame.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    w = W.orderBy("d").rowsBetween(-6, 0)
    arr = F.sort_array(F.collect_list("rev").over(w))
    n = F.size(arr)
    odd = F.element_at(arr, ((n + 1) / 2).cast("int"))
    even = (
        F.element_at(arr, (n / 2).cast("int"))
        + F.element_at(arr, (n / 2 + 1).cast("int"))
    ) / 2
    med = F.when(n % 2 == 1, odd).otherwise(even)
    return (
        daily.select("d", "rev", F.round(med, 2).alias("med7"))
        .orderBy("d")
        .limit(400)
    )
