"""Round-6 batch-3 deterministic distributed sampling.

A 100 TB curation pipeline samples constantly — audit slices, eval
holdouts, quality-weighted subcorpora — and it must do so (a) in one scan,
(b) without a global shuffle, and (c) reproducibly across reruns and
engines. Both ops here derive their randomness from a Weyl low-discrepancy
sequence on the stable row key (``u = frac(key · φ)``, φ the golden
ratio conjugate) instead of an engine RNG: every arithmetic step is an
IEEE-754 correctly-rounded op (multiply, floor, subtract, divide), so
Spark and the DuckDB oracle produce bit-identical priorities and the
sample is hash-checkable, not merely "plausible". One trap makes that
guarantee conditional: DuckDB parses a bare 0.618... literal as
DECIMAL and runs the whole expression in decimal arithmetic, which
agrees with double only while ids are small (it silently diverged at
sf0.1) — every oracle here CASTs the constant to DOUBLE so both
engines do the identical binary multiply.

The weighted op is Duffield–Lund–Thorup *priority sampling* ("Priority
sampling for estimation of arbitrary subset sums", JACM 2007 — public
literature): priority q_i = w_i / u_i, keep the n largest, threshold τ =
(n+1)-th priority, estimator ŵ_i = max(w_i, τ) which is unbiased for
subset-sum estimation. Reference parity: desdb had no sampling surface
(SURVEY.md §2A — reconstructed); this is new engine capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Golden-ratio conjugate for the Weyl sequence — standard quasi-random
#: multiplier (Knuth TAOCP v3 §6.4, multiplicative hashing).
PHI = 0.6180339887498949


def weyl_uniform(key_col):
    """Deterministic pseudo-uniform in (0, 1]: frac(key·φ), with 0 mapped
    to 1 so it can sit in a denominator. Bit-identical across engines."""
    x = key_col.cast("double") * F.lit(PHI)
    u = x - F.floor(x)
    return F.when(u == 0.0, F.lit(1.0)).otherwise(u)


@register(
    "sample_priority_weighted",
    oracle="""
        WITH pri AS (
            SELECT doc_id, n_chars,
                   CAST(n_chars AS DOUBLE) /
                   (CASE WHEN doc_id * CAST(0.6180339887498949 AS DOUBLE)
                              - floor(doc_id * CAST(0.6180339887498949 AS DOUBLE)) = 0
                         THEN 1.0
                         ELSE doc_id * CAST(0.6180339887498949 AS DOUBLE)
                              - floor(doc_id * CAST(0.6180339887498949 AS DOUBLE)) END)
                       AS priority
            FROM documents
        ), top AS (
            SELECT * FROM pri ORDER BY priority DESC, doc_id LIMIT 201
        ), tau AS (
            SELECT min(priority) AS tau FROM top
        )
        SELECT t.doc_id, t.n_chars,
               round(t.priority, 4) AS priority,
               round(CASE WHEN CAST(t.n_chars AS DOUBLE) > u.tau
                          THEN CAST(t.n_chars AS DOUBLE) ELSE u.tau END, 4)
                   AS est_weight
        FROM top t, tau u
        WHERE t.priority > u.tau
    """,
    group="sampling_ext",
)
def sample_priority_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """200-document quality-weighted sample of the corpus by priority
    sampling (weight = n_chars): priority = w/u with a deterministic
    Weyl uniform, keep the 200 largest, and attach the unbiased
    subset-sum estimator weight max(w, τ) where τ is the 201st priority.

    Scale shape: one scan computes priorities in codegen; top-(n+1) is a
    TakeOrderedAndProject (per-partition heaps, no global sort); τ comes
    from a global window over the already-limited 201 rows — the limit
    has collapsed them to one partition anyway, so the window costs
    nothing and avoids the BNLJ a 1-row crossJoin would plan. Nothing
    shuffles the corpus — this is exactly how you draw a weighted audit
    sample from 100 TB in one pass.
    """
    d = load_table(spark, sf_dir, "documents")
    pri = d.select(
        "doc_id",
        "n_chars",
        (F.col("n_chars").cast("double") / weyl_uniform(F.col("doc_id"))).alias(
            "priority"
        ),
    )
    top = pri.orderBy(F.desc("priority"), "doc_id").limit(201)
    return (
        top.withColumn("tau", F.min("priority").over(W.partitionBy()))
        .where(F.col("priority") > F.col("tau"))
        .select(
            "doc_id",
            "n_chars",
            F.round("priority", 4).alias("priority"),
            F.round(
                F.greatest(F.col("n_chars").cast("double"), F.col("tau")), 4
            ).alias("est_weight"),
        )
    )


@register(
    "sample_fixed_n_per_group",
    oracle="""
        SELECT lang, doc_id FROM (
            SELECT lang, doc_id,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY doc_id * CAST(0.6180339887498949 AS DOUBLE)
                                - floor(doc_id * CAST(0.6180339887498949 AS DOUBLE)),
                                doc_id) AS rk
            FROM documents) t
        WHERE rk <= 20
    """,
    group="sampling_ext",
)
def sample_fixed_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-20-documents-per-language audit sample: rank each group by
    the deterministic Weyl uniform and keep the first 20 — a reproducible
    stratified fixed-size sample (every rerun, every engine, same rows).

    Scale shape: one shuffle on lang; Spark pushes rk<=20 into the sort
    as a per-group running limit (WindowGroupLimit), so no group is ever
    fully sorted in memory. Contrast sample_stratified_docs
    (fraction-per-stratum) — this op pins the COUNT per stratum.
    """
    d = load_table(spark, sf_dir, "documents")
    # Raw fractional part (no 0→1 remap): ordering needs no denominator.
    x = F.col("doc_id").cast("double") * F.lit(PHI)
    u = x - F.floor(x)
    w = W.partitionBy("lang").orderBy(u.asc(), F.col("doc_id").asc())
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 20)
        .select("lang", "doc_id")
    )
