"""Window-function operators (SURVEY.md §2B windows).

Reference parity: window functions reached desdb users through the
arbitrary-SQL passthrough [desdb:desdb.py quick — SURVEY.md §2A A1]; Oracle
evaluated them server-side. Here they are Catalyst ``Window`` plans.

Scale notes (100 TB): a window is one shuffle on ``partitionBy`` + a
partition-local sort. The partition key (custkey / user_id) has high
cardinality, so partitions stay small and parallel. Running frames
(ROWS/RANGE UNBOUNDED PRECEDING) are computed incrementally — O(n) per
partition, no frame re-scan. Skewed partition keys are the main risk at
scale; AQE skew splitting does not apply to windows, so key choice matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "window_ranking",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn,
                   CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS INT) AS rnk,
                   CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS INT) AS drnk
            FROM orders
        ) WHERE rn <= 3
    """,
    group="windows",
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per customer; rn has a total tie-break."""
    o = load_table(spark, sf_dir, "orders")
    w_rn = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_st = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w_rn).alias("rn"),
            F.rank().over(w_st).alias("rnk"),
            F.dense_rank().over(w_st).alias("drnk"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "window_analytic_lag_lead",
    oracle="""
        SELECT event_id, user_id, value,
               lag(value) OVER w AS prev_value,
               lead(value) OVER w AS next_value,
               first_value(value) OVER w AS first_val
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    group="windows",
)
def window_analytic_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value per user over event time (total order via event_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_val"),
    )


@register(
    "window_frame_rows",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 2) AS moving_sum
        FROM orders
        ORDER BY o_custkey, o_orderkey
        LIMIT 1000
    """,
    group="windows",
)
def window_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-row moving sum of order totals per customer (bench query)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-9, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("moving_sum"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(1000)
    )


@register(
    "window_frame_range",
    oracle="""
        SELECT o_orderstatus, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_orderstatus ORDER BY o_orderkey
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        FROM orders
    """,
    group="windows",
)
def window_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total over a RANGE frame keyed on the unique orderkey."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_orderkey")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderstatus",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "window_distribution",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume,
               CAST(ntile(4) OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)
    """,
    group="windows",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile per customer.

    percent_rank and cume_dist order by the bare value (ties collapse
    identically in any engine); ntile requires the total (value, key)
    order for a deterministic assignment.
    """
    o = load_table(spark, sf_dir, "orders")
    w_val = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    w_total = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w_val), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_val), 6).alias("cume"),
        F.ntile(4).over(w_total).alias("quartile"),
    )
