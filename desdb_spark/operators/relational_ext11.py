"""Round-6 relational/window breadth: gaps-and-islands, ordered sequence
mining, running-distinct windows, calendar heatmaps, argmax/argmin
aggregates, weighted and higher-moment statistics.

Every op here is hash-checked — the shapes were chosen so both engines
can state the identical semantics (total orders everywhere a window or
arg-selection could tie; two-pass centered moments instead of the
cancellation-prone raw-power expansion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "window_gaps_islands",
    oracle="""
        WITH o AS (
            SELECT user_id, ts, event_id, value,
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_ts
            FROM events
        ), flagged AS (
            SELECT *, CASE WHEN prev_ts IS NULL
                            OR ts - prev_ts > INTERVAL '30 minutes'
                           THEN 1 ELSE 0 END AS brk
            FROM o
        ), islands AS (
            SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING)
                           AS BIGINT) AS island_id
            FROM flagged)
        SELECT user_id, island_id, min(ts) AS island_start,
               max(ts) AS island_end, count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM islands
        GROUP BY user_id, island_id
    """,
    group="relational_ext11",
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: split each user's event stream into activity
    islands wherever the gap to the previous event exceeds 30 minutes,
    then summarize each island (start, end, size, value). The classic
    sessionization-by-inactivity shape stated purely with windows — no
    session_window operator, so it runs identically in batch SQL.

    Scale shape: ONE shuffle on user_id serves the lag, the running
    break-sum, and (via partial aggregation on (user_id, island_id),
    which is a refinement of the same partitioning) the island rollup —
    Catalyst reuses the exchange across all three. Total order
    (ts, event_id) makes every tie deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts").cast("long") - F.lag("ts").over(w).cast("long") > 1800),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("brk", brk)
        .withColumn("island_id", F.sum("brk").over(run))
        .groupBy("user_id", "island_id")
        .agg(
            F.min("ts").alias("island_start"),
            F.max("ts").alias("island_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@register(
    "events_path_3gram",
    oracle="""
        WITH o AS (
            SELECT user_id, event_type,
                   lag(event_type, 2) OVER w AS t0,
                   lag(event_type, 1) OVER w AS t1
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT t0, t1, event_type AS t2, count(*) AS n
        FROM o WHERE t0 IS NOT NULL
        GROUP BY t0, t1, t2
    """,
    group="relational_ext11",
)
def events_path_3gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order path mining: counts of every (t-2, t-1, t) event-type
    triple along each user's time-ordered stream — one Markov order above
    events_transition_matrix, the signal behind funnel-step and bot-loop
    detection.

    Scale shape: one shuffle on user_id + per-partition sort for both
    lags (same window), then a hash aggregate on the triple. The
    aggregate's key space is |event_types|³ — tiny — so the final
    exchange is negligible; the window sort dominates exactly like any
    sessionizer.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.lag("event_type", 2).over(w).alias("t0"),
            F.lag("event_type", 1).over(w).alias("t1"),
            F.col("event_type").alias("t2"),
        )
        .where(F.col("t0").isNotNull())
        .groupBy("t0", "t1", "t2")
        .agg(F.count("*").alias("n"))
    )


@register(
    "window_running_distinct",
    oracle="""
        WITH ranked AS (
            SELECT user_id, ts, event_id, event_type,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS occ
            FROM events)
        SELECT user_id, ts, event_id,
               CAST(sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS n_distinct_types
        FROM ranked
    """,
    group="relational_ext11",
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered stream: after each event,
    how many distinct event types has this user produced so far? Spark
    states it directly — size(collect_set() OVER rows-unbounded) — while
    the oracle uses the portable first-occurrence trick (distinct-so-far
    = running sum of is-first-occurrence), so the hash check proves the
    two formulations equivalent under the same (ts, event_id) total
    order.

    Scale shape: one shuffle on user_id; the per-row set state is
    bounded by |event_types| (small domain), so collect_set never grows
    past a handful of entries — this is NOT the pattern for unbounded
    domains (use the first-occurrence form then, which is pure
    window-sum).
    """
    ev = load_table(spark, sf_dir, "events")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.select(
        "user_id",
        "ts",
        "event_id",
        F.size(F.collect_set("event_type").over(run)).cast("bigint").alias(
            "n_distinct_types"
        ),
    )


@register(
    "events_hourly_heatmap",
    oracle="""
        SELECT isodow(ts) AS dow, hour(ts) AS hr,
               count(*) AS n, round(avg(value), 4) AS avg_value
        FROM events
        GROUP BY dow, hr
    """,
    group="relational_ext11",
)
def events_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap — the ops-dashboard staple.
    Calendar parity trap made explicit: Spark's dayofweek() is
    Sunday=1 while DuckDB's isodow() is Monday=1; weekday()+1 IS isodow,
    and the hash check pins that mapping.

    Scale shape: scan → 168-key hash aggregate; partial aggregation
    collapses everything map-side, the exchange carries ≤168 rows per
    task. Nothing to optimize past predicate/column pushdown.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.weekday("ts") + 1).cast("bigint").alias("dow"),
            F.hour("ts").cast("bigint").alias("hr"),
        )
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


@register(
    "agg_argmax_minby",
    oracle="""
        SELECT c_nationkey,
               max_by(c_name, c_acctbal) AS richest,
               round(max(c_acctbal), 2) AS top_bal,
               min_by(c_name, c_acctbal) AS poorest,
               round(min(c_acctbal), 2) AS bottom_bal
        FROM customer
        GROUP BY c_nationkey
    """,
    group="relational_ext11",
)
def agg_argmax_minby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARGMAX/ARGMIN aggregation: per nation, the customer holding the
    max/min account balance — max_by/min_by in both engines (the
    SQL:2023 shape). The fixture's per-nation balance extremes are
    unique at every SF (verified before registration), so the selection
    is deterministic without a tie-break column; a planted-tie variant
    would need max_by over a (balance, key) struct instead.

    Scale shape: max_by's state is one (value, arg) pair per group —
    partial-aggregable, so the exchange carries |nations| rows. The
    cheapest possible argmax: no join back, no window sort.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.max_by("c_name", "c_acctbal").alias("richest"),
        F.round(F.max("c_acctbal"), 2).alias("top_bal"),
        F.min_by("c_name", "c_acctbal").alias("poorest"),
        F.round(F.min("c_acctbal"), 2).alias("bottom_bal"),
    )


@register(
    "agg_weighted_stats",
    oracle="""
        SELECT l_returnflag,
               round(sum(l_extendedprice * l_discount)
                     / sum(l_extendedprice), 6) AS w_avg_discount,
               round(sum(l_extendedprice * l_discount * l_discount)
                         / sum(l_extendedprice)
                     - pow(sum(l_extendedprice * l_discount)
                           / sum(l_extendedprice), 2), 6) AS w_var_discount,
               round(sum(l_extendedprice), 2) AS total_weight
        FROM lineitem
        GROUP BY l_returnflag
    """,
    group="relational_ext11",
)
def agg_weighted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean and variance: discount weighted by extended price —
    'how discounted is a revenue dollar', not 'how discounted is a line
    item'. Both engines state the same three weighted sums, so the hash
    check is pure arithmetic parity; the E[wx²]−E[wx]² expansion is safe
    here because discounts live in [0, 0.1] (no cancellation blow-up —
    contrast agg_central_moments, which must center first).

    Scale shape: three partial-aggregable sums, one |groups|-row
    exchange — identical economics to any groupBy-sum.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w_sum = F.sum(F.col("l_extendedprice"))
    wx_sum = F.sum(F.col("l_extendedprice") * F.col("l_discount"))
    wx2_sum = F.sum(
        F.col("l_extendedprice") * F.col("l_discount") * F.col("l_discount")
    )
    return li.groupBy("l_returnflag").agg(
        F.round(wx_sum / w_sum, 6).alias("w_avg_discount"),
        F.round(wx2_sum / w_sum - F.pow(wx_sum / w_sum, F.lit(2)), 6).alias(
            "w_var_discount"
        ),
        F.round(w_sum, 2).alias("total_weight"),
    )


@register(
    "agg_central_moments",
    oracle="""
        WITH mu AS (
            SELECT o_orderstatus, avg(o_totalprice) AS m
            FROM orders GROUP BY o_orderstatus)
        SELECT o.o_orderstatus,
               round(avg(pow(o.o_totalprice - mu.m, 2)), 2) AS m2,
               round(avg(pow(o.o_totalprice - mu.m, 3))
                     / pow(avg(pow(o.o_totalprice - mu.m, 2)), 1.5), 4)
                   AS skewness,
               round(avg(pow(o.o_totalprice - mu.m, 4))
                     / pow(avg(pow(o.o_totalprice - mu.m, 2)), 2) - 3, 4)
                   AS excess_kurtosis
        FROM orders o JOIN mu ON o.o_orderstatus = mu.o_orderstatus
        GROUP BY o.o_orderstatus
    """,
    group="relational_ext11",
)
def agg_central_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per order status via
    TWO-PASS centered moments. Spark's built-in skewness()/kurtosis()
    and DuckDB's disagree on bias correction (population vs sample), so
    the portable statement is the definition itself — and centering
    before raising to powers is mandatory: the raw-moment expansion
    E[x³]−3μE[x²]+2μ³ cancels catastrophically at o_totalprice scale
    (~1e5 → x³ ~1e15) and would not survive a 4 dp hash check.

    Scale shape: pass 1 is a |groups|-row aggregate, broadcast back onto
    the fact scan (Catalyst broadcasts it automatically at this size) —
    so the two-pass form costs ONE extra scan, no extra shuffle. The
    fused single-pass update formula (Welford/Pébay) is the streaming
    alternative when re-scanning is the bottleneck.
    """
    o = load_table(spark, sf_dir, "orders")
    mu = o.groupBy("o_orderstatus").agg(F.avg("o_totalprice").alias("m"))
    centered = o.join(F.broadcast(mu), "o_orderstatus").withColumn(
        "d", F.col("o_totalprice") - F.col("m")
    )
    m2 = F.avg(F.pow("d", F.lit(2)))
    m3 = F.avg(F.pow("d", F.lit(3)))
    m4 = F.avg(F.pow("d", F.lit(4)))
    return centered.groupBy("o_orderstatus").agg(
        F.round(m2, 2).alias("m2"),
        F.round(m3 / F.pow(m2, F.lit(1.5)), 4).alias("skewness"),
        F.round(m4 / F.pow(m2, F.lit(2)) - 3, 4).alias("excess_kurtosis"),
    )
