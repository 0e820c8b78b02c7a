"""Round-8e: hapax-legomena ratio per source — lexical richness
telemetry (classic corpus linguistics, public literature: the share of
vocabulary occurring exactly once is the standard richness/novelty
index). Operationally it flags templated or machine-generated sources:
organic text holds a fat hapax tail (Zipf), template farms re-use a
closed vocabulary and their hapax share collapses — a cheap upstream
cousin of docs_boilerplate_ngrams that needs no n-grams at all.

Exact integers and floor micros; complements text_vocab_coverage_curve
(corpus-level head mass) with the per-source tail mass.

Scale shape: one (source, word) groupBy with map-side combine — the
reduced table is per-source vocabulary, thousands of times smaller
than the corpus — then a per-source conditional aggregate over it. At
100 TB this is a token scan plus vocabulary-sized shuffles; nothing
pairwise anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "text_hapax_ratio_by_source",
    oracle="""
        WITH toks AS (
            SELECT source, unnest(list_filter(string_split(text, ' '),
                                              x -> x <> '')) AS w
            FROM documents
        ), wc AS (
            SELECT source, w, CAST(count(*) AS BIGINT) AS c
            FROM toks GROUP BY source, w
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_types,
               CAST(sum(c) AS BIGINT) AS n_instances,
               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax,
               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                    // count(*) AS BIGINT) AS hapax_type_share_micros,
               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                    // sum(c) AS BIGINT) AS hapax_instance_share_micros
        FROM wc GROUP BY source ORDER BY source
    """,
    group="hapax_ext",
)
def text_hapax_ratio_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per source: vocabulary size (types), token instances, words
    occurring exactly once in that source (hapax), and the hapax share
    of types and of instances in exact floor micros — low shares mark
    closed-vocabulary/templated sources."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("w"),
    )
    wc = toks.groupBy("source", "w").agg(
        F.count("*").cast("bigint").alias("c")
    )
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    # Shares via integer DIV on DECIMAL(38,0), not floor(double division)
    # (ADVICE r8): n_hapax×10⁶ crosses 2^53 (double-exactness) near 10⁹
    # types and int64 near 10¹³ — real corpus-scale counts; DECIMAL div
    # matches the oracle's // at any scale.
    counts = wc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_types"),
        F.sum("c").cast("bigint").alias("n_instances"),
        hapax.cast("bigint").alias("n_hapax"),
    )
    return counts.select(
        "source",
        "n_types",
        "n_instances",
        "n_hapax",
        F.expr(
            "CAST((CAST(n_hapax AS DECIMAL(38,0)) * 1000000)"
            " div n_types AS BIGINT)"
        ).alias("hapax_type_share_micros"),
        F.expr(
            "CAST((CAST(n_hapax AS DECIMAL(38,0)) * 1000000)"
            " div n_instances AS BIGINT)"
        ).alias("hapax_instance_share_micros"),
    ).orderBy("source")
