"""Round-8e: per-source epoch schedule under a total token budget —
the "how many passes over each source" table a training run publishes
(public practice: LLaMA's dataset table reports exactly
sampling-proportion + epochs per source; the Pile and GPT-3 papers
likewise).

Composes the sqrt-temperature mix discipline of ``corpus_mix_weights``
(training_prep.py) with a fixed token budget: each source's target
token allotment is budget-share-by-√tokens, and sources whose target
exceeds their unique supply repeat — reported as exact full epochs +
remainder tokens + oversample ratio. Everything is exact integer
arithmetic: √ enters only as floor(sqrt(double)) — IEEE sqrt is
correctly rounded (unlike ln/exp), so both engines produce the same
integer weight.

Scale shape: one groupBy shuffle over the SOURCE key space; the weight
normalizer is a scalar subquery over the already-aggregated handful of
source rows (inlines as a literal — no join, the corpus_mix_weights
precedent). At 100 TB this op's cost is exactly one token-count scan;
the schedule itself is a dashboard-sized table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Total training token budget. ~4× the fixture corpus, so the schedule
#: exercises the oversampling branch (epochs > 1) that is its point; at
#: the real scale this is the run's token count (e.g. 15e12).
TOKEN_BUDGET = 100_000


@register(
    "corpus_epoch_schedule",
    oracle=f"""
        WITH per_source AS (
            SELECT source,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY source
        ), weighted AS (
            SELECT source, n_tokens,
                   CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                       AS w
            FROM per_source
        ), targeted AS (
            SELECT source, n_tokens, w,
                   CAST(CAST({TOKEN_BUDGET} AS BIGINT) * w
                        // CAST((SELECT sum(w) FROM weighted) AS BIGINT)
                        AS BIGINT) AS target_tokens
            FROM weighted
        )
        SELECT source, n_tokens, w AS weight_isqrt, target_tokens,
               CAST(target_tokens // n_tokens AS BIGINT) AS n_full_epochs,
               CAST(target_tokens % n_tokens AS BIGINT)
                   AS remainder_tokens,
               CAST(target_tokens * 1000000 // n_tokens AS BIGINT)
                   AS oversample_micros
        FROM targeted
        ORDER BY source
    """,
    group="epoch_schedule",
)
def corpus_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch schedule per source for a {TOKEN_BUDGET}-token run:
    √token-count mix weights allocate the budget, and each source's
    allotment is expressed as exact full epochs over its unique tokens
    plus a remainder (the partial final epoch a dataloader draws at a
    reduced rate) plus the oversample ratio in floor micros — >1e6
    means the source repeats, the signal that caps how hot a small
    high-quality source can run before memorization risk."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens")
    )
    weighted = per_source.withColumn(
        "w",
        F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("bigint"),
    )
    weighted.createOrReplaceTempView("epoch_sched_weights")
    targeted = spark.sql(
        f"""
        SELECT source, n_tokens, w,
               CAST({TOKEN_BUDGET} AS BIGINT) * w
                   DIV (SELECT sum(w) FROM epoch_sched_weights)
                   AS target_tokens
        FROM epoch_sched_weights
        """
    )
    return targeted.select(
        "source",
        "n_tokens",
        F.col("w").alias("weight_isqrt"),
        "target_tokens",
        F.expr("target_tokens DIV n_tokens").alias("n_full_epochs"),
        (F.col("target_tokens") % F.col("n_tokens")).alias(
            "remainder_tokens"
        ),
        F.expr("target_tokens * 1000000 DIV n_tokens").alias(
            "oversample_micros"
        ),
    ).orderBy("source")
