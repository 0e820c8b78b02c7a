"""Round-8e: deterministic shard assignment + balance audit and the
same-cell cosine separation histogram — two pre-flight reports a
distributed curation run reads before committing compute.

``docs_shard_assignment_balance``: tokenization/embedding fleets split
the corpus into S worker shards by stable hash (public practice in
every map-reduce-era pipeline; determinism means a re-run re-produces
shard membership, so partial failures re-process only their shard).
The audit reports per-shard volume and the skew factor that decides
whether the straggler shard dominates wall-clock — shard by md5 of the
stable id (the training_prep.py bucketing discipline: compare/slice the
HEX, never convert to int, which the engines spell differently).

``emb_cell_cosine_histogram``: the separation diagnostic behind
dedup_semantic_embedding's SEM_THRESHOLD — a histogram of ALL same-cell
pair cosines (shared grain: dedup_semantic.twinned_scored_pairs). The
organic mass sits far below the planted-twin mass; the empty buckets
between them are the threshold's safety margin, made visible. Runs as
one conditional aggregate over the pair stream — the same cost as the
dedup pass it tunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.extensions.dedup_semantic import (
    SCORED_CTE,
    twinned_scored_pairs,
)
from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Shard count = 16 (one hex nibble of md5 — string-sliced, never
#: int-converted). At the real scale use 2-3 nibbles (256-4096 shards).
SHARD_NIBBLES = 1

#: Cosine histogram bucket width in micros (0.1 per bucket over [-1, 1]).
COS_BUCKET_MICROS = 100_000


@register(
    "docs_shard_assignment_balance",
    oracle=f"""
        WITH sharded AS (
            SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, {SHARD_NIBBLES})
                       AS shard,
                   len(string_split(text, ' ')) AS toks
            FROM documents
        ), per_shard AS (
            SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(toks) AS BIGINT) AS n_tokens
            FROM sharded GROUP BY shard
        )
        SELECT shard, n_docs, n_tokens,
               CAST(n_tokens * 1000000 //
                    sum(n_tokens) OVER () AS BIGINT) AS token_share_micros,
               CAST(n_tokens * {16 ** SHARD_NIBBLES} * 1000000 //
                    sum(n_tokens) OVER () AS BIGINT) AS balance_micros
        FROM per_shard
        ORDER BY shard
    """,
    group="sharding_ext",
)
def docs_shard_assignment_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per md5-nibble shard: documents, tokens, token share, and the
    balance factor in floor micros (1e6 = perfectly even; the max row
    IS the fleet's straggler multiplier).

    Scale shape: one groupBy over {16 ** SHARD_NIBBLES} shard keys with
    map-side combine; the share window spans the shard table only.
    """
    d = load_table(spark, sf_dir, "documents")
    sharded = d.select(
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")),
            1,
            SHARD_NIBBLES,
        ).alias("shard"),
        F.size(F.split("text", " ")).alias("toks"),
    )
    per_shard = sharded.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("n_tokens"),
    )
    from pyspark.sql import Window

    total = F.sum("n_tokens").over(Window.partitionBy())
    return per_shard.select(
        "shard",
        "n_docs",
        "n_tokens",
        F.floor(F.col("n_tokens") * 1000000 / total)
        .cast("bigint")
        .alias("token_share_micros"),
        F.floor(F.col("n_tokens") * (16**SHARD_NIBBLES) * 1000000 / total)
        .cast("bigint")
        .alias("balance_micros"),
    ).orderBy("shard")


@register(
    "emb_cell_cosine_histogram",
    oracle=SCORED_CTE
    + f"""
        SELECT CAST(floor(CAST(round(cos_q * 1000000, 0) AS BIGINT)
                          / {COS_BUCKET_MICROS}) AS BIGINT)
                   * {COS_BUCKET_MICROS} AS bucket_lo_micros,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM scored
        GROUP BY 1 ORDER BY 1
    """,
    group="sharding_ext",
)
def emb_cell_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of every same-cell pair cosine (bucket width
    {COS_BUCKET_MICROS} micros): the organic mass, the planted-twin
    spike near 1e6, and the empty gap between them that justifies
    SEM_THRESHOLD — computed from the identical pair grain the dedup
    decision list consumes, for the cost of one aggregate."""
    scored = twinned_scored_pairs(spark, sf_dir)
    bucket = (
        F.floor(
            F.round(F.col("cos_q") * 1000000, 0).cast("bigint")
            / COS_BUCKET_MICROS
        ).cast("bigint")
        * COS_BUCKET_MICROS
    )
    return (
        scored.groupBy(bucket.alias("bucket_lo_micros"))
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .orderBy("bucket_lo_micros")
    )
