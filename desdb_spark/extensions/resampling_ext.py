"""Round-6 batch-19 resampling inference (delete-one-group jackknife).

Standard errors for corpus-level statistics can't assume i.i.d. rows —
documents within a source are correlated (same crawler, same template).
The survey-statistics answer is the delete-one-GROUP jackknife (Tukey /
Quenouille, public literature): recompute the statistic leaving out one
source at a time and read the variance off the replicate spread. The
scalable trick is that every leave-one-out replicate is pure arithmetic
on per-group sufficient statistics — total sums minus the group's sums
— so ALL replicates come from one aggregation pass, no resampled scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "stat_jackknife_mean_ci",
    oracle="""
        WITH grp AS (
            SELECT source,
                   CAST(count(*) AS DOUBLE) AS n,
                   sum(CAST(n_chars AS DOUBLE)) AS s
            FROM documents GROUP BY source
        ), tot AS (
            SELECT sum(n) AS tn, sum(s) AS ts,
                   CAST(count(*) AS BIGINT) AS g
            FROM grp
        ), reps AS (
            SELECT (t.ts - grp.s) / (t.tn - grp.n) AS loo_mean, t.g,
                   t.ts / t.tn AS full_mean
            FROM grp, tot t
        )
        SELECT CAST(max(g) AS BIGINT) AS n_groups,
               round(max(full_mean), 4) AS mean_chars,
               round(sqrt((max(g) - 1.0) / max(g)
                     * sum(pow(loo_mean - full_mean, 2))), 4) AS jackknife_se
        FROM reps
    """,
    group="resampling_ext",
)
def stat_jackknife_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-source jackknife standard error of mean document
    length: one leave-one-out replicate per source, each computed as
    (total sum − group sum)/(total n − group n), SE via the jackknife
    formula √((g−1)/g · Σ(θ̂₍ᵢ₎ − θ̂)²) with the full-sample mean as
    center. Group-level deletion respects within-source correlation —
    the SE an i.i.d. bootstrap would understate.

    Scale shape: ONE map-side-combinable aggregation produces the
    per-group sufficient statistics; totals attach via a window over
    the g-row group table (g = sources, tiny by construction); the g
    replicates are row-local arithmetic. No replicate ever rescans the
    corpus — the reason grouped jackknife is THE resampling method that
    survives 100 TB.
    """
    d = load_table(spark, sf_dir, "documents")
    grp = d.groupBy("source").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("n_chars").cast("double")).alias("s"),
    )
    wall = W.partitionBy()
    reps = grp.select(
        ((F.sum("s").over(wall) - F.col("s")) / (F.sum("n").over(wall) - F.col("n"))).alias(
            "loo_mean"
        ),
        (F.sum("s").over(wall) / F.sum("n").over(wall)).alias("full_mean"),
        F.count("*").over(wall).alias("g"),
    )
    g = F.max("g").cast("double")
    return reps.agg(
        F.max("g").cast("bigint").alias("n_groups"),
        F.round(F.max("full_mean"), 4).alias("mean_chars"),
        F.round(
            F.sqrt(
                (g - 1) / g
                * F.sum(F.pow(F.col("loo_mean") - F.col("full_mean"), F.lit(2)))
            ),
            4,
        ).alias("jackknife_se"),
    )
