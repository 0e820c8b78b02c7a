"""Round-7: Neyman (minimum-variance) stratified sample allocation —
deciding HOW MANY rows to sample per stratum before any sampling runs.
Proportional allocation oversamples homogeneous strata; Neyman's
optimum (public survey-sampling theory: n_h ∝ N_h·σ_h) splits a fixed
budget by each stratum's size × spread, which is what a data-curation
team actually wants when budgeting human review or eval examples
across sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Total sample budget to allocate across (lang, source) strata.
BUDGET = 1000


@register(
    "sample_neyman_allocation",
    # Exact cross-engine arithmetic: σ_h from integer sufficient stats
    # (Σx, Σx² over n_chars), the allocation weight N_h·σ_h as one
    # double product, shares as single divisions of exact-sum doubles,
    # and the integer allocation by largest-remainder so the budget
    # conservation (Σ alloc = BUDGET) is exact in the hash.
    oracle=f"""
        WITH strata AS (
            SELECT lang, source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS s1,
                   CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
            FROM documents GROUP BY lang, source
        ), weighted AS (
            SELECT lang, source, n_docs,
                   n_docs * sqrt((CAST(s2 AS DOUBLE)
                                  - CAST(s1 AS DOUBLE) * s1 / n_docs)
                                 / (n_docs - 1)) AS w
            FROM strata WHERE n_docs > 1
        ), shared AS (
            SELECT lang, source, n_docs, w,
                   w / sum(w) OVER () * {BUDGET} AS exact_alloc
            FROM weighted
        ), floored AS (
            SELECT lang, source, n_docs,
                   CAST(floor(exact_alloc) AS BIGINT) AS base,
                   exact_alloc - floor(exact_alloc) AS rem,
                   round(w, 4) AS weight
            FROM shared
        ), ranked AS (
            SELECT *,
                   row_number() OVER (ORDER BY rem DESC, lang, source)
                       AS rr,
                   {BUDGET} - sum(base) OVER () AS leftover
            FROM floored
        )
        SELECT lang, source, n_docs, weight,
               CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc
        FROM ranked
    """,
    group="sampling_ext2",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocate a {BUDGET}-row sample budget across (lang, source)
    strata by Neyman's optimum n_h ∝ N_h·σ_h (σ over n_chars), with
    largest-remainder integer rounding so the allocations sum exactly
    to the budget.

    Scale shape: one sufficient-stats aggregate over the corpus
    (map-side combine; three integers per stratum), then windows over
    the tiny strata frame. σ_h comes from exact integer (Σx, Σx²) — no
    accumulation-order exposure — and the largest-remainder step is
    the penny-exact allocation discipline (operators/allocation.py)
    reused for sampling budgets.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    strata = d.groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("s2"),
    )
    sd = F.sqrt(
        (
            F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1") / F.col("n_docs")
        )
        / (F.col("n_docs") - 1)
    )
    weighted = strata.where(F.col("n_docs") > 1).select(
        "lang", "source", "n_docs", (F.col("n_docs") * sd).alias("w")
    )
    wall = Window.partitionBy()
    shared = weighted.select(
        "lang",
        "source",
        "n_docs",
        "w",
        (F.col("w") / F.sum("w").over(wall) * BUDGET).alias("exact_alloc"),
    )
    floored = shared.select(
        "lang",
        "source",
        "n_docs",
        F.floor("exact_alloc").cast("bigint").alias("base"),
        (F.col("exact_alloc") - F.floor("exact_alloc")).alias("rem"),
        F.round("w", 4).alias("weight"),
    )
    wr = Window.orderBy(F.desc("rem"), "lang", "source")
    ranked = floored.select(
        "lang",
        "source",
        "n_docs",
        "weight",
        "base",
        F.row_number().over(wr).alias("rr"),
        (F.lit(BUDGET) - F.sum("base").over(wall)).alias("leftover"),
    )
    return ranked.select(
        "lang",
        "source",
        "n_docs",
        "weight",
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc"),
    )
