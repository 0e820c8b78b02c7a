"""Round-8: one-pass Poisson bootstrap — how confidence intervals are
actually computed at 100 TB (Owen & Eckles 2012, public literature).
Classical bootstrap resamples the dataset R times; at scale you instead
give every row an independent Poisson(1) weight PER REPLICATE and
aggregate all R replicates in ONE pass — the explode-by-R fanout is the
entire cost, and each replicate's weighted sum is an ordinary map-side-
combining aggregate.

Determinism contract: replicate weights derive from the Weyl
quasi-uniform on (row_key · R + r) pushed through the exact Poisson(1)
inverse CDF — the repo's standard differential-testing substitute for
seeded RNG ([[cross-engine-float-traps]] / sampling_ext.py precedent).
Quasi-random weights are NOT iid (they are low-discrepancy, which if
anything makes replicate means slightly too regular); a production run
swaps `weyl_uniform` for a hash-based iid uniform and keeps every other
line. Weighted sums accumulate as exact integer cents·weight (weights
are small ints), so the hash is summation-order-proof; each replicate
mean is one deterministic double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.extensions.sampling_ext import weyl_uniform
from desdb_spark.registry import register
from desdb_spark.session import load_table

N_REPLICATES = 50

#: Poisson(1) CDF cut points (cumulative e^{-1}/k!), k = 0..5; u above
#: the last threshold maps to 6. Fixed double literals in both engines.
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)

_POIS_SQL = (
    "CASE "
    + " ".join(
        f"WHEN u < CAST({t} AS DOUBLE) THEN {k}"
        for k, t in enumerate(_POIS_CDF)
    )
    + " ELSE 6 END"
)

_WEYL_SQL = """
    (CASE WHEN key * CAST(0.6180339887498949 AS DOUBLE)
               - floor(key * CAST(0.6180339887498949 AS DOUBLE)) = 0
          THEN CAST(1.0 AS DOUBLE)
          ELSE key * CAST(0.6180339887498949 AS DOUBLE)
               - floor(key * CAST(0.6180339887498949 AS DOUBLE)) END)
"""


@register(
    "stat_bootstrap_mean_ci",
    oracle=f"""
        WITH w AS (
            SELECT r,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
                   {_POIS_SQL} AS wgt
            FROM (
                SELECT o_totalprice, r,
                       {_WEYL_SQL} AS u
                FROM (
                    SELECT o_totalprice,
                           o_orderkey * {N_REPLICATES} + r.r AS key, r.r
                    FROM orders,
                         (SELECT unnest(generate_series(0,
                              {N_REPLICATES - 1})) AS r) r))
        ), reps AS (
            SELECT r,
                   round(CAST(sum(wgt * cents) AS DOUBLE)
                         / greatest(sum(wgt), 1), 6) AS m
            FROM w GROUP BY r
            UNION ALL
            SELECT -1,
                   round(CAST(sum(CAST(round(o_totalprice * 100, 0)
                                       AS BIGINT)) AS DOUBLE)
                         / count(*), 6)
            FROM orders
        ), ranked AS (
            SELECT r, m,
                   CASE WHEN r >= 0 THEN
                       row_number() OVER (PARTITION BY (r >= 0)
                                          ORDER BY m, r) END AS rk
            FROM reps
        )
        SELECT CAST({N_REPLICATES} AS INT) AS n_replicates,
               max(CASE WHEN r = -1 THEN m END) AS point_mean_cents,
               max(CASE WHEN rk = 2 THEN m END) AS ci_lo_cents,
               max(CASE WHEN rk = {N_REPLICATES - 1} THEN m END)
                   AS ci_hi_cents
        FROM ranked
    """,
    group="bootstrap_ext",
)
def stat_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~96% Poisson-bootstrap CI for the mean order price (cents): the
    full-data point estimate plus the 2nd-smallest / 2nd-largest of 50
    replicate means. The replicate fanout (orders × R) is the whole
    cost — one shuffle on the replicate id, whose key space is R.

    Scale shape: at 100 TB the explode is the textbook tradeoff (R× map
    work, constant-size aggregate state per replicate); replicate
    means never touch the driver until the final 51-row ranking.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    fan = o.select(
        cents.alias("cents"),
        F.explode(F.sequence(F.lit(0), F.lit(N_REPLICATES - 1))).alias("r"),
        "o_orderkey",
    )
    u = weyl_uniform(F.col("o_orderkey") * N_REPLICATES + F.col("r"))
    wgt = F.lit(6)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        wgt = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(wgt)
    weighted = fan.select("r", "cents", wgt.alias("wgt"))
    reps = weighted.groupBy("r").agg(
        F.round(
            F.sum(F.col("wgt") * F.col("cents")).cast("double")
            / F.greatest(F.sum("wgt"), F.lit(1)),
            6,
        ).alias("m")
    )
    point = o.agg(
        F.lit(-1).alias("r"),
        F.round(F.sum(cents).cast("double") / F.count("*"), 6).alias("m"),
    )
    ranked = reps.unionByName(point).withColumn(
        "rk",
        F.when(
            F.col("r") >= 0,
            F.row_number().over(
                Window.partitionBy(F.col("r") >= 0).orderBy("m", "r")
            ),
        ),
    )
    return ranked.agg(
        F.lit(N_REPLICATES).cast("int").alias("n_replicates"),
        F.max(F.when(F.col("r") == -1, F.col("m"))).alias("point_mean_cents"),
        F.max(F.when(F.col("rk") == 2, F.col("m"))).alias("ci_lo_cents"),
        F.max(F.when(F.col("rk") == N_REPLICATES - 1, F.col("m"))).alias(
            "ci_hi_cents"
        ),
    )
