"""Round-8: n-gram novelty by arrival order — corpus-growth telemetry
(public practice in web-crawl curation, e.g. CommonCrawl snapshot
analyses): as documents arrive, what fraction of each document's
{NGRAM}-grams has the corpus never seen before? The marginal-novelty
curve answers the operational question "is this source still adding
information, or has it saturated?" — the signal that drives crawl
re-visit budgets and per-source retention caps.

Arrival order is ``doc_id`` (the fixture's only order); a gram's first
sighting is therefore ``min(doc_id)`` over its occurrences, and a gram
is NOVEL in exactly the document that first contains it. All outputs
are exact integers (counts and floor-micros ratios) — no float crosses
the engine boundary.

Scale shape: one explode → per-(doc, gram) distinct (map-side combine
collapses within-doc repeats) → ONE shuffle keyed by gram for the
min(doc_id) aggregate (at 100 TB the gram ships as a 64-bit rolling
hash — docs_boilerplate_ngrams discipline) → the novelty flag rides a
second aggregate back on the doc key. With a real event-time column the
min() becomes a watermarked streaming aggregate and the curve updates
incrementally; the batch shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Gram width; novelty is at the distinct-gram grain within a doc.
NGRAM = 3


@register(
    "text_ngram_novelty_curve",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), doc_grams AS (
            SELECT DISTINCT doc_id,
                   array_to_string(t[i:i+{NGRAM - 1}], ' ') AS g
            FROM toks, unnest(range(1, len(t) - {NGRAM - 2})) AS r(i)
        ), first_seen AS (
            SELECT g, min(doc_id) AS first_doc FROM doc_grams GROUP BY g
        )
        SELECT d.doc_id,
               CAST(count(*) AS BIGINT) AS n_grams_distinct,
               CAST(sum(CASE WHEN f.first_doc = d.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
               CAST(sum(CASE WHEN f.first_doc = d.doc_id
                             THEN 1 ELSE 0 END) * 1000000
                    // count(*) AS BIGINT) AS novelty_micros
        FROM doc_grams d JOIN first_seen f USING (g)
        GROUP BY d.doc_id
        ORDER BY d.doc_id
    """,
    group="novelty_ext",
)
def text_ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal novelty per document in arrival (doc_id) order: distinct
    {NGRAM}-gram count, how many of those grams the corpus had never
    seen in any earlier document, and the novelty ratio in exact floor
    micros."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    t = F.col("t")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(NGRAM - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, NGRAM)),
    )
    doc_grams = (
        d.select("doc_id", toks.alias("t"))
        .where(F.size("t") >= NGRAM)
        .select("doc_id", F.explode(grams).alias("g"))
        .distinct()
    )
    first_seen = doc_grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    # Ratio via integer DIV on DECIMAL(38,0), not floor(double division)
    # (ADVICE r8): exact at any count scale, matching the oracle's //.
    counts = (
        doc_grams.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams_distinct"),
            novel.cast("bigint").alias("n_novel"),
        )
    )
    return counts.select(
        "doc_id",
        "n_grams_distinct",
        "n_novel",
        F.expr(
            "CAST((CAST(n_novel AS DECIMAL(38,0)) * 1000000)"
            " div n_grams_distinct AS BIGINT)"
        ).alias("novelty_micros"),
    ).orderBy("doc_id")
