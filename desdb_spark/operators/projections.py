"""Projection and filter operators (SURVEY.md §2B projections/filters).

Reference parity: computed projections and predicate combos mirror the
column lists + WHERE shapes of desdb's canned info queries
[desdb:files.py Red/Coadd — SURVEY.md §2A A6] and arbitrary passthrough SQL
[desdb:desdb.py quick — A1].

Scale notes: all expressions are built-in column ops → whole-stage codegen,
no Python in the row path; filters are Catalyst-pushable conjunctions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "project_expr",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS net_price,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross_price
        FROM lineitem
    """,
    group="projections",
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns: discounted net price and tax-inclusive gross price.

    Unrounded on purpose: per-row IEEE arithmetic on identical inputs is
    bitwise-reproducible across engines; only order-dependent aggregates
    need rounding (SURVEY.md §5.3, refined).
    """
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("gross_price"),
    )


@register(
    "filter_pred_combo",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM orders
        WHERE o_orderstatus = 'O'
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_totalprice BETWEEN 1000 AND 200000
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
          AND o_orderpriority LIKE '%H%'
    """,
    group="projections",
)
def filter_pred_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``=`` + ``IN`` + ``BETWEEN`` + ``LIKE`` combined (A6 predicate shapes)."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        (F.col("o_orderstatus") == "O")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(1000, 200000)
        & F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1998-12-31").cast("timestamp")
        )
        & F.col("o_orderpriority").like("%H%")
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@register(
    "filter_conditional_nulls",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 150000 THEN 'big'
                    WHEN o_totalprice > 50000 THEN 'mid'
                    ELSE 'small' END AS price_bucket,
               coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
               least(o_totalprice, 100000.0) AS capped_lo,
               greatest(o_totalprice, 1000.0) AS capped_hi
        FROM orders
    """,
    group="projections",
)
def filter_conditional_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / coalesce / nullif / least / greatest (A1 conditional surface)."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(p > 150000, "big").when(p > 50000, "mid").otherwise("small").alias(
            "price_bucket"
        ),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.least(p, F.lit(100000.0)).alias("capped_lo"),
        F.greatest(p, F.lit(1000.0)).alias("capped_hi"),
    )
