"""Round-6 corpus-audit ops: the multi-signal quality gate report and the
per-source duplication-rate audit — the two tables a training-data curator
reads before deciding which sources to keep, upweight, or drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "corpus_quality_gate_report",
    oracle="""
        WITH sig AS (
            SELECT lang, n_chars,
                   length(text) - length(replace(text, ' ', '')) + 1
                       AS n_tokens
            FROM documents)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(CASE WHEN n_chars BETWEEN 100 AND 450
                             THEN 1 ELSE 0 END) AS BIGINT) AS pass_len,
               CAST(sum(CASE WHEN n_tokens BETWEEN 20 AND 80
                             THEN 1 ELSE 0 END) AS BIGINT) AS pass_tokens,
               CAST(sum(CASE WHEN CAST(n_chars AS DOUBLE) / n_tokens
                                  BETWEEN 4.5 AND 5.5
                             THEN 1 ELSE 0 END) AS BIGINT) AS pass_wordshape,
               CAST(sum(CASE WHEN n_chars BETWEEN 100 AND 450
                              AND n_tokens BETWEEN 20 AND 80
                              AND CAST(n_chars AS DOUBLE) / n_tokens
                                  BETWEEN 4.5 AND 5.5
                             THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
        FROM sig
        GROUP BY lang
    """,
    group="quality_gates",
)
def corpus_quality_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-gate funnel: how many documents pass the
    length gate, the token-count gate, the mean-word-shape gate, and ALL
    gates — the aggregate view a curator tunes thresholds against before
    running pipeline_quality_filter (which drops rows; this op only
    counts). Gate widths are set to split the fixture corpus, not pass
    it wholesale.

    Scale shape: every signal is a scan-side string/arithmetic
    expression in whole-stage codegen; the aggregate exchanges
    |langs| × 5 counters. The single-split fixture trap does not bite —
    per-row work is a couple of length() calls, not shingling.
    """
    d = load_table(spark, sf_dir, "documents")
    n_tokens = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    )
    sig = d.select(
        "lang",
        "n_chars",
        n_tokens.alias("n_tokens"),
    )
    len_ok = F.col("n_chars").between(100, 450)
    tok_ok = F.col("n_tokens").between(20, 80)
    shape_ok = (F.col("n_chars").cast("double") / F.col("n_tokens")).between(
        4.5, 5.5
    )
    as_cnt = lambda cond: F.sum(cond.cast("bigint"))  # noqa: E731
    return sig.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        as_cnt(len_ok).alias("pass_len"),
        as_cnt(tok_ok).alias("pass_tokens"),
        as_cnt(shape_ok).alias("pass_wordshape"),
        as_cnt(len_ok & tok_ok & shape_ok).alias("pass_all"),
    )


@register(
    "docs_dup_rate_by_source",
    oracle="""
        WITH corpus AS (
            SELECT source, doc_id, text FROM documents
            UNION ALL
            SELECT source, doc_id + 1000000,
                   upper('  ' || replace(text, ' ', '   ') || ' ')
            FROM documents WHERE doc_id % 50 = 0
        ), canon AS (
            SELECT source,
                   md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                       AS ck
            FROM corpus)
        SELECT source, count(*) AS n_docs,
               count(DISTINCT ck) AS n_canonical,
               round(1.0 - count(DISTINCT ck) * 1.0 / count(*), 4)
                   AS dup_rate
        FROM canon
        GROUP BY source
    """,
    group="quality_gates",
)
def docs_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication rate per source over canonicalized text — the audit
    that decides which sources get deduped first (scraped mirrors sit at
    high dup_rate, curated sources near zero). Uses the same planted
    formatting-copies as dedup_canonical_text (the fixture has no
    organic re-formatted dups), so sources containing a planted doc show
    a real nonzero rate.

    Scale shape: count(DISTINCT ck) per source is the one genuinely
    shuffling step — Spark plans it as a two-phase expand/aggregate on
    (source, ck), which is exactly right; the payload never moves, only
    digests.
    """
    d = load_table(spark, sf_dir, "documents").select("source", "doc_id", "text")
    planted = (
        d.where(F.col("doc_id") % 50 == 0)
        .select(
            "source",
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.upper(
                F.concat(
                    F.lit("  "),
                    F.regexp_replace("text", " ", "   "),
                    F.lit(" "),
                )
            ).alias("text"),
        )
    )
    corpus = d.unionByName(planted)
    ck = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    return (
        corpus.select("source", ck.alias("ck"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("ck").alias("n_canonical"),
            F.round(
                1.0 - F.countDistinct("ck") * F.lit(1.0) / F.count("*"), 4
            ).alias("dup_rate"),
        )
    )
