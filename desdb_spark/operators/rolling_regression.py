"""Round-8e: rolling OLS regression slope over a windowed frame — the
trend detector every revenue/traffic dashboard runs (a windowed
least-squares fit; public formula, e.g. NIST handbook §4): per day, the
slope of daily revenue over the trailing {WINDOW_DAYS}-row window.

Where ``stat_linear_regression`` (stats_inference.py) fits ONE line
from global sufficient statistics, this op fits a line PER ROW from
windowed sufficient statistics — the composition that makes OLS a
streaming/window operator: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), all
five sums carried by one window frame over exact integers (x = day
index, y = revenue cents), so the numerator and denominator are exact
BIGINTs and the final ratio quantizes via DECIMAL(38,0)/HUGEINT
truncating integral division (micros of cents-per-day) — no float ever crosses engines.

Scale shape: the corpus-sized work is one groupBy to the CALENDAR-DAY
grain (map-side combined); the window then runs over ~thousands of day
rows — a single-partition window over a provably tiny input (the
docs/SCALING.md §3 rule), partitionable by year/series key the moment
there are multiple series. This is exactly how you'd trend 100 TB of
fact rows: reduce to the dashboard grain first, fit lines second.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Trailing window width in day ROWS (distinct order dates).
WINDOW_DAYS = 30
#: Day-index epoch (the fixture's first order date).
EPOCH = "1995-01-01"


@register(
    "window_rolling_regression_slope",
    oracle=f"""
        WITH daily AS (
            SELECT datediff('day', TIMESTAMP '{EPOCH}', o_orderdate) AS x,
                   CAST(o_orderdate AS DATE) AS order_date,
                   CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS y
            FROM orders GROUP BY 1, 2
        ), sums AS (
            SELECT order_date, x, y,
                   CAST(count(*) OVER w AS BIGINT) AS n,
                   CAST(sum(x) OVER w AS BIGINT) AS sx,
                   CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
                   CAST(sum(y) OVER w AS BIGINT) AS sy,
                   CAST(sum(x * y) OVER w AS BIGINT) AS sxy
            FROM daily
            WINDOW w AS (ORDER BY x
                         ROWS BETWEEN {WINDOW_DAYS - 1} PRECEDING
                                  AND CURRENT ROW)
        )
        SELECT order_date, n AS n_days, y AS day_cents,
               CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
               CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                    ELSE CAST(CAST(n * sxy - sx * sy AS HUGEINT) * 1000000
                              // (n * sxx - sx * sx) AS BIGINT)
               END AS slope_cents_per_day_micros
        FROM sums ORDER BY order_date
    """,
    group="rolling_regression",
)
def window_rolling_regression_slope(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per order date: revenue cents that day and the OLS slope of daily
    revenue over the trailing {WINDOW_DAYS} day-rows (exact integer
    numerator/denominator plus the trunc-micros ratio; NULL until two
    distinct days exist — a one-point window has zero x-variance)."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.select(
            F.datediff(F.col("o_orderdate"), F.lit(EPOCH).cast("timestamp"))
            .cast("bigint")
            .alias("x"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("x", "order_date")
        .agg(F.sum("cents").cast("bigint").alias("y"))
    )
    # single-partition window: input is the calendar-day grain
    # (~1.1k rows at sf0.1) — tiny by construction, per SCALING.md §3
    w = (
        Window.orderBy("x")
        .rowsBetween(-(WINDOW_DAYS - 1), Window.currentRow)
    )
    sums = daily.select(
        "order_date",
        "x",
        "y",
        F.count("*").over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").alias("sxx"),
        F.sum("y").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("bigint").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return sums.select(
        "order_date",
        F.col("n").alias("n_days"),
        F.col("y").alias("day_cents"),
        num.cast("bigint").alias("slope_num"),
        den.cast("bigint").alias("slope_den"),
        F.when(den == 0, F.lit(None).cast("bigint"))
        .otherwise(
            # Slopes go negative: both engines' integral division
            # truncates toward zero (Spark DIV; DuckDB // on integers —
            # verified: -9267486e6 // 9 = -1029720666666 there), so the
            # quantized ratio agrees without a floor adjustment.
            F.expr(
                "CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0)) * 1000000"
                " DIV (n * sxx - sx * sx) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("slope_cents_per_day_micros"),
    ).orderBy("order_date")
