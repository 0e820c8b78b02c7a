"""Relational surface extensions, round 5 batch 2: null-safe equality
joins, boolean aggregates, IGNORE NULLS window navigation, and
multi-column distinct aggregation — four more ANSI-SQL shapes reachable
through desdb's arbitrary-SQL passthrough [desdb:desdb.py Connection.quick
— reconstructed, SURVEY.md §0] that exercise distinct planner paths
(null-aware join keys, Expand-based multi-distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "join_null_safe_eq",
    oracle="""
        WITH l AS (
            SELECT nullif(o_orderstatus, 'P') AS k, count(*) AS n_orders
            FROM orders GROUP BY nullif(o_orderstatus, 'P')
        ), r AS (
            SELECT nullif(l_linestatus, 'O') AS k, count(*) AS n_lines
            FROM lineitem GROUP BY nullif(l_linestatus, 'O')
        )
        SELECT l.k AS status_key, n_orders, n_lines
        FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
    group="relational_ext8",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics CDC and
    late-arriving-dimension joins need when the key itself is optional.

    Scale shape: a null-safe predicate is still an EQUI-join — Spark
    hashes the key with null as an ordinary value, so the plan is a
    regular (broadcast/shuffled) hash join, never a BNLJ. The NULL key
    concentrates its rows on one partition: at 100 TB with a null-heavy
    key, pre-split the null stratum or rely on AQE skew handling.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    left = o.groupBy(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("k")
    ).agg(F.count("*").alias("n_orders"))
    right = li.groupBy(
        F.nullif(F.col("l_linestatus"), F.lit("O")).alias("k")
    ).agg(F.count("*").alias("n_lines"))
    return left.join(right, left["k"].eqNullSafe(right["k"])).select(
        left["k"].alias("status_key"), "n_orders", "n_lines"
    )


@register(
    "agg_bool_flags",
    oracle="""
        SELECT o_orderpriority,
               bool_and(o_totalprice > 1000) AS all_above_1k,
               bool_or(o_orderstatus = 'F') AS any_finished,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
    group="relational_ext8",
)
def agg_bool_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (``bool_and``/``bool_or`` = ANSI EVERY/ANY):
    per-group invariant flags — "did every order clear the floor price,
    did any finish" — the data-quality-assertion aggregate.

    Scale shape: booleans fold associatively in the partial aggregate,
    so each map task ships one bit per (group, flag); the exchange is as
    small as an aggregate exchange can be.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_above_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.count("*").alias("n_orders"),
    )


@register(
    "window_last_ignore_nulls",
    oracle="""
        SELECT event_id, user_id, ts, event_type,
               round(last_value(CASE WHEN event_type = 'purchase'
                                     THEN value END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING), 4)
                   AS last_purchase_value
        FROM events
        ORDER BY user_id, ts, event_id
        LIMIT 5000
    """,
    group="relational_ext8",
)
def window_last_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation: carry each user's most recent
    purchase amount forward onto every subsequent event — the
    last-observation-carried-forward shape feature pipelines use for
    sparse signals.

    Scale shape: one shuffle on user_id, one running frame; the
    conditional inside the window keeps it a single pass (no self-join
    against the purchases subset). Total tie-break (ts, event_id) makes
    the carried value deterministic; LIMIT with total order bounds the
    differential payload.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            F.round(F.last(purchase_val, ignorenulls=True).over(w), 4).alias(
                "last_purchase_value"
            ),
        )
        .orderBy("user_id", "ts", "event_id")
        .limit(5000)
    )


@register(
    "agg_multi_distinct",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps,
               count(DISTINCT l_orderkey) AS n_orders,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
    """,
    group="relational_ext8",
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several COUNT(DISTINCT …) over different columns in one aggregate
    — the profiling query shape (cardinality per dimension at a glance).

    Scale shape: Catalyst plans multi-distinct via Expand — each input
    row fans out once per distinct column with a grouping id, then a
    two-level aggregate dedups and counts. One logical pass over the
    fact table, one exchange on (group, gid, value); no per-column
    re-scan. At extreme scale swap exact counts for
    approx_count_distinct (agg_approx_count_distinct) — same plan minus
    the Expand.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count("*").alias("n_rows"),
    )
