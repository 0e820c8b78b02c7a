"""Training-data pipeline depth, round 5 batch 6: benchmark
decontamination and PII scrubbing — two gates every serious pretraining
corpus passes through that the registry didn't cover yet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: n-gram size for contamination matching (8 is the common published
#: choice — long enough that shared grams imply copying, short enough to
#: survive small edits).
CONTAM_N = 8

_EMAIL_RE = r"[a-z0-9.]+@[a-z0-9.]+[a-z]"
_PHONE_RE = r"555-[0-9]{4}"


@register(
    "corpus_contamination_ngram",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, doc_id % 10 = 0 AS is_bench,
                   string_split(text, ' ') AS t
            FROM documents),
        idx AS (
            SELECT doc_id, is_bench, t,
                   unnest(generate_series(1, greatest(len(t) - {CONTAM_N - 1}, 0)))
                       AS i
            FROM toks),
        grams AS (
            SELECT DISTINCT doc_id, is_bench,
                   array_to_string(t[i:i + {CONTAM_N - 1}], ' ') AS g
            FROM idx),
        train_grams AS (
            SELECT DISTINCT g FROM grams WHERE NOT is_bench),
        bench AS (
            SELECT doc_id, count(*) AS n_grams,
                   count(tg.g) AS n_contaminated
            FROM grams b LEFT JOIN train_grams tg ON b.g = tg.g
            WHERE b.is_bench
            GROUP BY doc_id)
        SELECT doc_id, n_grams, n_contaminated,
               round(n_contaminated * 1.0 / greatest(n_grams, 1), 4)
                   AS contamination_rate
        FROM bench
        ORDER BY contamination_rate DESC, doc_id
        LIMIT 200
    """,
    group="pipeline_ext",
)
def corpus_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination check: treat every 10th document as a
    held-out eval set and measure, per held-out doc, what fraction of its
    distinct 8-gram shingles also occur anywhere in the training split —
    the standard published n-gram contamination test (a high rate means
    the eval text leaks into training data and its scores are
    meaningless).

    Scale shape: both splits reduce to DISTINCT (doc, gram) pairs; the
    train side dedups to a distinct-gram set BEFORE the join (one
    aggregate), so the join key multiplicity is ≤1 on the build side —
    an 8-gram is rare by construction, so no hot keys. The per-doc
    rollup shuffles one row per (bench doc, matched flag) count. At
    100 TB the train gram set hash-partitions; the published trick of
    Bloom-filtering the probe side drops the shuffle further and slots
    in here without changing the contract.
    """
    from desdb_spark.extensions.dedup import ensure_parallelism, shingles

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    grams = d.select(
        "doc_id",
        (F.col("doc_id") % 10 == 0).alias("is_bench"),
        F.explode(F.array_distinct(shingles(F.col("text"), CONTAM_N))).alias("g"),
    ).distinct()
    train_grams = grams.where(~F.col("is_bench")).select("g").distinct()
    bench = grams.where("is_bench").alias("b")
    joined = bench.join(
        train_grams.withColumn("hit", F.lit(1)).alias("t"), "g", "left"
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("hit").alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            F.round(
                F.col("n_contaminated") / F.greatest(F.col("n_grams"), F.lit(1)), 4
            ).alias("contamination_rate"),
        )
        .orderBy(F.col("contamination_rate").desc(), "doc_id")
        .limit(200)
    )


@register(
    "docs_pii_scrub_stats",
    oracle=f"""
        WITH planted AS (
            SELECT doc_id, source,
                   CASE WHEN doc_id % 50 = 0
                        THEN text || ' contact: user' || doc_id ||
                             '@example.com call 555-0199'
                        ELSE text END AS text2
            FROM documents),
        scrubbed AS (
            SELECT doc_id, source,
                   len(regexp_extract_all(text2, '{_EMAIL_RE}')) AS n_emails,
                   len(regexp_extract_all(text2, '{_PHONE_RE}')) AS n_phones,
                   length(text2) -
                   length(regexp_replace(regexp_replace(text2,
                          '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g')) AS len_delta
            FROM planted)
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS docs_flagged,
               CAST(sum(n_emails) AS BIGINT) AS total_emails,
               CAST(sum(n_phones) AS BIGINT) AS total_phones,
               CAST(sum(len_delta) AS BIGINT) AS total_len_delta
        FROM scrubbed
        GROUP BY source
    """,
    group="pipeline_ext",
)
def docs_pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing audit: detect and redact email/phone patterns,
    reporting per-source hit counts and the redaction size delta. The
    fixture corpus is synthetic (PII-free), so deterministic markers are
    planted on every 50th doc INSIDE the query — both engines construct
    the identical input, and the differential then certifies the
    detection + replacement machinery end-to-end.

    Scale shape: regex extraction and replacement are scan-side
    expressions (whole-stage codegen, no Python); the aggregate ships a
    few counters per source per task. Real deployments swap the toy
    patterns for a vetted PII pattern pack and write the scrubbed text
    column out — same plan, wider payload.
    """
    d = load_table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 50 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact: user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com call 555-0199"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text2"),
    )
    n_emails = F.size(F.regexp_extract_all("text2", F.lit(_EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all("text2", F.lit(_PHONE_RE), 0))
    scrub = F.regexp_replace(
        F.regexp_replace("text2", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    stats = planted.select(
        "source",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        (F.length("text2") - F.length(scrub)).alias("len_delta"),
    )
    return stats.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.when(F.col("n_emails") + F.col("n_phones") > 0, 1).otherwise(0)
        ).alias("docs_flagged"),
        F.sum("n_emails").cast("bigint").alias("total_emails"),
        F.sum("n_phones").cast("bigint").alias("total_phones"),
        F.sum("len_delta").cast("bigint").alias("total_len_delta"),
    )
