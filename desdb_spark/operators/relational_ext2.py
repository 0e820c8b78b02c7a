"""Relational coverage extensions, round 4 (SURVEY.md §2B widening).

Full-outer join reconciliation, correlation/covariance aggregates, and the
conditional scalar family — three more canned-query shapes a desdb user
issued as literal SQL through ``Connection.quick()`` [desdb:desdb.py quick
— reconstructed, SURVEY.md §0 / §2A A1]. Pure built-in expression work, no
UDFs; determinism per SURVEY.md §5.3 (floats rounded; no top-level sort —
the driver hash is order-insensitive, and a full-table global sort would
be a gratuitous range-exchange at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "join_full_outer",
    oracle="""
        SELECT coalesce(c_custkey, o_custkey) AS custkey,
               max(c_name) AS c_name,
               CAST(count(o_orderkey) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS total_spent
        FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY coalesce(c_custkey, o_custkey)
    """,
    group="relational_ext2",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation: every customer (with or without orders)
    and every order (with or without a matching customer), rolled up per
    coalesced key.

    Scale shape: FULL OUTER cannot broadcast (both sides must surface
    unmatched rows), so the plan is the honest one — both sides shuffle on
    custkey into a sort-merge full-outer join. The groupBy key is the
    *derived* coalesce expression, so Catalyst can't prove co-partitioning
    and plans a second exchange — but only after a partial aggregate that
    has already collapsed to one row per key (both join sides hash on the
    same key, so each key's rows are co-located), i.e. the second shuffle
    ships ~|keys| rows, not the join output.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return (
        j.groupBy(F.coalesce("c_custkey", "o_custkey").alias("custkey"))
        .agg(
            F.max("c_name").alias("c_name"),
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
    )


@register(
    "agg_corr_covar",
    oracle="""
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_samp_qp,
               round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_pop_qp,
               round(stddev_samp(l_quantity), 6) AS std_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
    group="relational_ext2",
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per return flag: corr, covar (sample+population),
    stddev. All partial-aggregable co-moment sketches — map-side combine,
    one shuffle on the 3-value group key; rounded (corr/std 6 dp, covar
    4 dp) so cross-engine summation-order noise cannot flip the hash.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_samp_qp"),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_pop_qp"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        )
    )


@register(
    "scalar_conditional_funcs",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 200000 THEN 'big'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'small' END AS bucket,
               coalesce(nullif(o_orderstatus, 'O'), 'X') AS status_x,
               round(greatest(o_totalprice, 150000.0), 2) AS price_floor,
               round(least(o_totalprice, 150000.0), 2) AS price_cap
        FROM orders
    """,
    group="relational_ext2",
)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar family: CASE/WHEN buckets, coalesce∘nullif, and
    greatest/least clamping — all codegen'd row expressions, evaluated in
    the scan stage with no exchange at all.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("X")).alias("status_x"),
        F.round(F.greatest("o_totalprice", F.lit(150000.0)), 2).alias("price_floor"),
        F.round(F.least("o_totalprice", F.lit(150000.0)), 2).alias("price_cap"),
    )
