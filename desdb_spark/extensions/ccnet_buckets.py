"""Round-8e: CCNet-style perplexity buckets — the head/middle/tail
split (Wenzek et al., CCNet, public arXiv 1911.00359) that production
web-corpus curation applies per language: score every document under a
language model, rank within its language, and keep "head" (most
fluent), downweight "middle", usually drop "tail".

Composes the interpolated bigram-LM scorer (lm_score.SCORED_CTE /
scored_bigrams — one definition, two consumers) with a per-language
ntile(3). Per-doc mean log-probabilities quantize to integer
tenth-milli units (round-4dp × 10⁴ — recovering the integer the 4-dp
round already fixed) BEFORE any cross-doc aggregation, so bucket sums
are exact integers and the rank order is float-order-proof; ties break
on doc_id in both engines.

Scale shape: scoring is the lm_score plan (two corpus shuffles +
vocabulary broadcast); the split adds one window partitioned by LANG
over the per-doc score table — 1000× smaller than the corpus — and the
report aggregate reuses that partitioning. At 100 TB the per-language
ntile is the only stage that sorts, and it sorts doc-grain scores, not
text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.extensions.lm_score import SCORED_CTE, scored_bigrams
from desdb_spark.registry import register
from desdb_spark.session import load_table

#: ntile → CCNet bucket label (1 = most fluent).
BUCKETS = {1: "head", 2: "middle", 3: "tail"}

_BUCKET_SQL = (
    "CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END"
)


@register(
    "docs_ccnet_ppl_buckets",
    oracle=SCORED_CTE
    + f"""
        , per_doc AS (
            SELECT doc_id,
                   CAST(round(round(avg(lp), 4) * 10000, 0) AS BIGINT)
                       AS lp_tm,
                   CAST(count(*) AS BIGINT) AS n_bigrams
            FROM scored GROUP BY doc_id
        ), ranked AS (
            SELECT d.lang, p.lp_tm, p.n_bigrams,
                   ntile(3) OVER (PARTITION BY d.lang
                                  ORDER BY p.lp_tm DESC, p.doc_id) AS nt
            FROM per_doc p JOIN documents d USING (doc_id)
        )
        SELECT lang, CAST(nt AS INTEGER) AS bucket_ord,
               {_BUCKET_SQL} AS bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
               CAST(sum(lp_tm) AS BIGINT) AS sum_lp_tenthmilli,
               CAST(max(lp_tm) AS BIGINT) AS best_lp_tenthmilli,
               CAST(min(lp_tm) AS BIGINT) AS worst_lp_tenthmilli
        FROM ranked
        GROUP BY lang, nt
        ORDER BY lang, bucket_ord
    """,
    group="ccnet_buckets",
)
def docs_ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language head/middle/tail fluency split: each language's
    documents rank by quantized mean bigram log-probability (desc — head
    is the low-perplexity third) and the report aggregates each bucket's
    document count, transition mass, and exact integer score stats —
    the table a CCNet-style retention decision reads."""
    per_doc = (
        scored_bigrams(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.round(F.round(F.avg("lp"), 4) * 10000, 0)
            .cast("bigint")
            .alias("lp_tm"),
            F.count("*").cast("bigint").alias("n_bigrams"),
        )
    )
    langs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.col("lp_tm").desc(), F.col("doc_id")
    )
    ranked = per_doc.join(langs, "doc_id").withColumn(
        "nt", F.ntile(3).over(w)
    )
    label = (
        F.when(F.col("nt") == 1, "head")
        .when(F.col("nt") == 2, "middle")
        .otherwise("tail")
    )
    return (
        ranked.groupBy("lang", "nt")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_bigrams").cast("bigint").alias("n_bigrams"),
            F.sum("lp_tm").cast("bigint").alias("sum_lp_tenthmilli"),
            F.max("lp_tm").cast("bigint").alias("best_lp_tenthmilli"),
            F.min("lp_tm").cast("bigint").alias("worst_lp_tenthmilli"),
        )
        .select(
            "lang",
            F.col("nt").cast("int").alias("bucket_ord"),
            label.alias("bucket"),
            "n_docs",
            "n_bigrams",
            "sum_lp_tenthmilli",
            "best_lp_tenthmilli",
            "worst_lp_tenthmilli",
        )
        .orderBy("lang", "bucket_ord")
    )
