"""Corpus-quality depth ops (round 5): repetition scoring and embedding
quantization — two more steps of the LLM training-data pipeline tier
(SURVEY.md §2C), alongside extensions/text.py (frozen at its r2-verified
state) and extensions/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "text_repetition_score",
    oracle="""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        tf AS (
          SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
        per_doc AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                 max(c) AS top_c, count(*) AS n_distinct
          FROM tf GROUP BY doc_id)
        SELECT doc_id, n_tokens,
               round(top_c * 1.0 / n_tokens, 4) AS top_token_ratio,
               round(n_distinct * 1.0 / n_tokens, 4) AS distinct_ratio
        FROM per_doc
        ORDER BY top_token_ratio DESC, doc_id
        LIMIT 100
    """,
    group="quality_ext",
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition scoring (Gopher-style quality rule): per document, the
    most-frequent-token share and the distinct-token ratio; surface the
    100 most repetitive documents. High top-token share flags boilerplate
    and degenerate generations before they enter a training mix.

    Scale shape: explode → two groupBys that BOTH hash on doc_id (the
    (doc_id, tok) aggregate partial-aggregates map-side, then the doc
    rollup reuses the same partitioning — one logical exchange over
    token rows, one over per-doc rows). Top-100 plans as
    TakeOrderedAndProject with a total tie-break; no Python row path.
    """
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    per_doc = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.max("c").alias("top_c"),
        F.count("*").alias("n_distinct"),
    )
    return (
        per_doc.select(
            "doc_id",
            "n_tokens",
            F.round(F.col("top_c") / F.col("n_tokens"), 4).alias("top_token_ratio"),
            F.round(F.col("n_distinct") / F.col("n_tokens"), 4).alias(
                "distinct_ratio"
            ),
        )
        .orderBy(F.col("top_token_ratio").desc(), "doc_id")
        .limit(100)
    )


@register(
    "emb_quantize_int8",
    oracle="""
        WITH el AS (
          SELECT vec_id, generate_subscripts(embedding, 1) AS d,
                 CAST(unnest(embedding) AS DOUBLE) AS x
          FROM embeddings),
        stats AS (
          SELECT d, min(x) AS vmin, max(x) AS vmax FROM el GROUP BY d),
        err AS (
          SELECT el.d, vmin, vmax,
                 abs(x - (round((x - vmin) / ((vmax - vmin) / 255.0))
                          * ((vmax - vmin) / 255.0) + vmin)) AS e
          FROM el JOIN stats ON el.d = stats.d)
        SELECT CAST(d AS INT) AS dim, round(vmin, 4) AS vmin,
               round(vmax, 4) AS vmax, round(avg(e), 6) AS avg_abs_err
        FROM err GROUP BY d, vmin, vmax
    """,
    group="quality_ext",
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization audit for an embedding column: per-dimension
    min/max affine scale (the standard symmetric-range code) and the mean
    absolute reconstruction error — the go/no-go report before shipping
    a quantized ANN index at 1/4 the memory.

    Scale shape: posexplode fans each vector into 64 (dim, value) rows —
    a narrow map, no shuffle — then ONE exchange on dim (64 keys) serves
    the min/max aggregate; the 64-row stats frame broadcasts back onto
    the element stream (BroadcastHashJoin) so reconstruction error is
    computed in the same scan without re-shuffling elements, and the
    final per-dim average partial-aggregates map-side. Dims are few and
    balanced, so the 64-key shuffle cannot skew.
    """
    e = load_table(spark, sf_dir, "embeddings")
    el = e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    ).select("vec_id", (F.col("pos") + 1).alias("d"), "x")
    stats = el.groupBy("d").agg(F.min("x").alias("vmin"), F.max("x").alias("vmax"))
    scale = (F.col("vmax") - F.col("vmin")) / 255.0
    recon = F.round((F.col("x") - F.col("vmin")) / scale) * scale + F.col("vmin")
    err = el.join(F.broadcast(stats), "d").select(
        "d", "vmin", "vmax", F.abs(F.col("x") - recon).alias("e")
    )
    return err.groupBy("d", "vmin", "vmax").agg(
        F.round(F.avg("e"), 6).alias("avg_abs_err")
    ).select(
        F.col("d").cast("int").alias("dim"),
        F.round("vmin", 4).alias("vmin"),
        F.round("vmax", 4).alias("vmax"),
        "avg_abs_err",
    )
