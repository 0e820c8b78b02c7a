"""Text-analysis depth ops, round 5: stopword density, sentence-shape
stats, and a corpus word-length histogram — three more signals of the
pretraining quality tier (extensions/text.py holds the r2-verified base
set). All are pure built-in column expressions: tokenization, filtering,
and aggregation stay JVM-side in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Small fixed function-word list (public-domain English closed-class
#: words). Kept tiny and inline: the op measures the *mechanism* (list
#: membership ratio per token stream); production swaps in a per-language
#: list without changing the plan.
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
)


@register(
    "text_stopword_ratio",
    oracle=f"""
        WITH per_doc AS (
            SELECT doc_id, lang,
                   len(list_filter(string_split(lower(text), ' '),
                                   x -> x <> '')) AS n_tokens,
                   len(list_filter(string_split(lower(text), ' '),
                                   x -> x IN {STOPWORDS!r})) AS n_stop
            FROM documents)
        SELECT lang, count(*) AS doc_cnt,
               round(avg(n_stop * 1.0 / greatest(n_tokens, 1)), 6)
                   AS avg_stopword_ratio,
               round(min(n_stop * 1.0 / greatest(n_tokens, 1)), 6)
                   AS min_stopword_ratio,
               round(max(n_stop * 1.0 / greatest(n_tokens, 1)), 6)
                   AS max_stopword_ratio
        FROM per_doc
        GROUP BY lang
    """,
    group="text_ext",
)
def text_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword density per language: share of tokens that are function
    words, averaged over documents — a classic C4/Gopher quality signal
    (natural prose has a stable stopword band; lists and boilerplate
    fall outside it).

    Scale shape: token filtering is a higher-order array expression
    evaluated in the scan (no explode — the token array never leaves
    the row), so the only exchange is the per-lang aggregate over one
    small row per document.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    stop = F.filter(
        F.split(F.lower("text"), " "), lambda x: x.isin(*STOPWORDS)
    )
    ratio = F.col("n_stop") / F.greatest(F.col("n_tokens"), F.lit(1))
    return (
        d.select(
            "lang",
            F.size(toks).alias("n_tokens"),
            F.size(stop).alias("n_stop"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("doc_cnt"),
            F.round(F.avg(ratio), 6).alias("avg_stopword_ratio"),
            F.round(F.min(ratio), 6).alias("min_stopword_ratio"),
            F.round(F.max(ratio), 6).alias("max_stopword_ratio"),
        )
    )


@register(
    "text_sentence_stats",
    oracle="""
        WITH per_doc AS (
            SELECT source,
                   len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                                   x -> trim(x) <> '')) AS n_sents,
                   len(list_filter(string_split(text, ' '),
                                   x -> x <> '')) AS n_words
            FROM documents)
        SELECT source, count(*) AS doc_cnt,
               round(avg(n_sents), 4) AS avg_sentences,
               round(avg(n_words * 1.0 / greatest(n_sents, 1)), 4)
                   AS avg_words_per_sentence
        FROM per_doc
        GROUP BY source
    """,
    group="text_ext",
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-shape profile per source: sentences per document and words
    per sentence (terminator-split heuristic). Degenerate values — one
    giant run-on, or thousands of one-word "sentences" — separate prose
    from tables/logs in a quality gate.

    Scale shape: both counts are scan-side array expressions; one
    exchange on the (few-valued) source key.
    """
    d = load_table(spark, sf_dir, "documents")
    sents = F.filter(
        F.split("text", r"[.!?]+"), lambda x: F.trim(x) != ""
    )
    words = F.filter(F.split("text", " "), lambda x: x != "")
    wps = F.col("n_words") / F.greatest(F.col("n_sents"), F.lit(1))
    return (
        d.select(
            "source",
            F.size(sents).alias("n_sents"),
            F.size(words).alias("n_words"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("doc_cnt"),
            F.round(F.avg("n_sents"), 4).alias("avg_sentences"),
            F.round(F.avg(wps), 4).alias("avg_words_per_sentence"),
        )
    )


@register(
    "text_word_length_hist",
    oracle="""
        SELECT CAST(length(tok) AS BIGINT) AS word_len,
               count(*) AS n_words
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> ''
        GROUP BY length(tok)
        ORDER BY word_len
    """,
    group="text_ext",
)
def text_word_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide word-length histogram — the cheapest corpus fingerprint
    (natural-language corpora have a stable length curve; a shifted curve
    flags encoding damage or non-text contamination before training).

    Scale shape: explode → groupBy on ~40 distinct lengths. The partial
    aggregate collapses each map task's tokens to ≤40 rows before the
    exchange, so shuffle volume is O(tasks × lengths) regardless of
    corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy(F.length("tok").cast("bigint").alias("word_len"))
        .agg(F.count("*").alias("n_words"))
        .orderBy("word_len")
    )
