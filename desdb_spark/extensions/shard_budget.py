"""Round-9: token-budget output sharding — the writer-side plan every
training pipeline needs: pack documents, in a deterministic order, into
shards of ≈ SHARD_CAP tokens each, per source (sources shard
independently in practice — they ship on different cadences and mix
ratios). The op emits the shard MANIFEST (per-shard doc range, doc
count, token total), which is the unit a `sink_partitioned_parquet`-
style writer then materializes; greedy start-based assignment (a doc
belongs to the shard where its exclusive prefix sum lands) is the
standard contiguous-packing rule — deterministic, single-pass,
restart-safe.

Scale shape: one scan computes per-doc token counts; the running sum is
a window partitioned BY SOURCE (thousands of independent partitions at
corpus scale — never a global single-task cumsum), and the shard
roll-up reuses the same (source)-hash shuffle. All arithmetic is exact
integers; the shard index is integer DIV of the exclusive prefix by the
cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Target tokens per output shard (fixture-scaled; production uses
#: ~100M-token shards — same plan, one constant).
SHARD_CAP = 5_000


@register(
    "docs_shard_by_token_budget",
    oracle=f"""
        WITH nt AS (
            SELECT source, doc_id,
                   len(list_filter(string_split(text, ' '),
                                   x -> x <> '')) AS nt
            FROM documents
        ), p AS (
            SELECT source, doc_id, nt,
                   coalesce(sum(nt) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS pe
            FROM nt
        )
        SELECT source,
               CAST(pe // {SHARD_CAP} AS BIGINT) AS shard_ix,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nt) AS BIGINT) AS shard_tokens,
               CAST(min(doc_id) AS BIGINT) AS first_doc,
               CAST(max(doc_id) AS BIGINT) AS last_doc
        FROM p GROUP BY source, pe // {SHARD_CAP}
        ORDER BY source, shard_ix
    """,
    group="shard_budget",
)
def docs_shard_by_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, shard) manifest under greedy {SHARD_CAP}-token
    packing in doc_id order: doc count, exact token total, and the
    contiguous doc_id range — shards slightly overshoot the cap by at
    most one document, the standard contiguous-packing tradeoff
    (`corpus_waterfill_domain_caps` decides HOW MUCH of each source to
    take; this op decides the file layout of what was taken)."""
    d = load_table(spark, sf_dir, "documents")
    nt = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    docs = d.select("source", "doc_id", nt.alias("nt"))
    w_prev = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p = docs.select(
        "source",
        "doc_id",
        "nt",
        F.coalesce(F.sum("nt").over(w_prev), F.lit(0)).alias("pe"),
    )
    return (
        p.select(
            "source",
            "doc_id",
            "nt",
            F.expr(f"pe div {SHARD_CAP}").alias("shard_ix"),
        )
        .groupBy("source", "shard_ix")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("shard_tokens"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
        )
        .orderBy("source", "shard_ix")
    )
