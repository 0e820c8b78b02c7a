"""Round-7: incremental dedup — the PRODUCTION shape of deduplication.

A 100 TB corpus is never re-deduped from scratch: the pipeline keeps a
digest index of what it already holds and checks each INCOMING batch
against (a) that index and (b) itself. Only the delta shuffles; the
index side is a semi/anti-join target that at scale lives bucketed by
digest so the probe is co-located.

Fixture staging (the raw corpus has no byte- or format-identical
copies, verified in round 7): the historical corpus is the first 80% of
doc_ids; the incoming batch is the remaining 20% PLUS planted
reformatted copies — of corpus docs (→ ``dup_of_corpus``) and doubled
copies of batch docs (→ ``dup_in_batch``) — hashed through the same
whitespace/case canonicalization as dedup_canonical_text, so the op
exercises every class deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Fraction of doc_ids (by rank order) treated as the historical corpus.
CORPUS_FRACTION = 0.8


def _canon(col):
    """Whitespace-collapse + trim + lowercase canonical digest (the
    dedup_canonical_text discipline)."""
    return F.md5(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))))


def _mangle(col):
    """Deterministic formatting damage: triple every space, pad, upcase."""
    return F.upper(F.concat(F.lit("  "), F.regexp_replace(col, " ", "   "), F.lit(" ")))


@register(
    "dedup_incremental_new_batch",
    oracle=f"""
        WITH split AS (
            SELECT CAST(floor(count(*) * CAST({CORPUS_FRACTION} AS DOUBLE))
                        AS BIGINT) AS n_corpus
            FROM documents
        ), ranked AS (
            SELECT doc_id, text,
                   row_number() OVER (ORDER BY doc_id) AS rn
            FROM documents
        ), corpus AS (
            SELECT DISTINCT
                   md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                       AS h
            FROM ranked, split WHERE rn <= split.n_corpus
        ), batch_raw AS (
            SELECT doc_id, text FROM ranked, split WHERE rn > split.n_corpus
            UNION ALL
            SELECT doc_id + 1000000,
                   upper('  ' || replace(text, ' ', '   ') || ' ')
            FROM ranked, split
            WHERE rn <= split.n_corpus AND doc_id % 100 = 0
            UNION ALL
            SELECT doc_id + 2000000,
                   upper('  ' || replace(text, ' ', '   ') || ' ')
            FROM ranked, split
            WHERE rn > split.n_corpus AND doc_id % 100 = 0
        ), batch AS (
            SELECT doc_id,
                   md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                       AS h
            FROM batch_raw
        ), classified AS (
            SELECT b.doc_id,
                   CASE
                     WHEN c.h IS NOT NULL THEN 'dup_of_corpus'
                     WHEN b.doc_id > min(b.doc_id) OVER (PARTITION BY b.h)
                       THEN 'dup_in_batch'
                     ELSE 'novel'
                   END AS status
            FROM batch b LEFT JOIN corpus c ON b.h = c.h
        )
        SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(doc_id) AS BIGINT) AS first_doc,
               CAST(max(doc_id) AS BIGINT) AS last_doc
        FROM classified GROUP BY status
    """,
    group="dedup_incremental",
)
def dedup_incremental_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify each incoming-batch document against the historical
    canonical-digest index: dup_of_corpus / dup_in_batch / novel, with
    per-class counts and doc_id extrema.

    Scale shape: the index side reduces to DISTINCT digests (one
    16-byte value per unique canonical text — what a pipeline actually
    persists); the probe is a broadcast-or-bucketed equi-join on digest
    keyed to the BATCH's size, not the corpus's; within-batch dedup is
    one min-window over the batch's own digests. Nothing rescans corpus
    text. The row_number split is fixture staging — in production the
    split is the ingest boundary and costs nothing.
    """
    d = load_table(spark, sf_dir, "documents")
    n_corpus = int(d.count() * CORPUS_FRACTION)
    ranked = d.select(
        "doc_id", "text", F.row_number().over(Window.orderBy("doc_id")).alias("rn")
    )
    corpus_docs = ranked.where(F.col("rn") <= n_corpus)
    batch_docs = ranked.where(F.col("rn") > n_corpus)
    corpus = corpus_docs.select(_canon(F.col("text")).alias("h")).distinct()
    batch = (
        batch_docs.select("doc_id", "text")
        .unionByName(
            corpus_docs.where(F.col("doc_id") % 100 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                _mangle(F.col("text")).alias("text"),
            )
        )
        .unionByName(
            batch_docs.where(F.col("doc_id") % 100 == 0).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                _mangle(F.col("text")).alias("text"),
            )
        )
        .select("doc_id", _canon(F.col("text")).alias("h"))
    )
    # r17 (the ADVICE r16 forced-broadcast class): the digest index grows
    # with the CORPUS, not the batch — forcing the hint would hit the
    # 8 GB broadcast cap at scale where the docstring's bucketed join is
    # the shape. n_corpus is already computed (one digest ≤ 16 B + row
    # overhead); beyond ~256 MB of digests the planner chooses, which
    # degrades to a shuffled join instead of a driver OOM.
    hint = F.broadcast if n_corpus * 16 <= 256 * 1024 * 1024 else (lambda df: df)
    w_batch = Window.partitionBy("h")
    classified = (
        batch.join(
            hint(corpus.withColumn("in_corpus", F.lit(True))), "h", "left"
        )
        .withColumn("first_in_batch", F.min("doc_id").over(w_batch))
        .select(
            "doc_id",
            F.when(F.col("in_corpus"), "dup_of_corpus")
            .when(F.col("doc_id") > F.col("first_in_batch"), "dup_in_batch")
            .otherwise("novel")
            .alias("status"),
        )
    )
    return classified.groupBy("status").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
    )
