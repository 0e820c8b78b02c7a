"""Text analysis for training-data pipelines (SURVEY.md §2B north-star).

Operators: token statistics, per-language corpus profile, quality scoring,
n-gram language ID, and rolling-hash fingerprinting. Everything except the
language-ID heuristic is built-in expression work; language ID uses the
same explode+join shape as an inverted index, so it too stays JVM-side.

Scale notes (100 TB): tokenization via ``split``/``explode`` shuffles
(token, 1) pairs that combine map-side; per-document scoring is
shuffle-free narrow work. The language profiler aggregates to
(lang, source) cardinality — tiny shuffle regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: BPE-ish word/punct splitter: word pieces, numbers, or single punctuation.
BPE_ISH_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


@register(
    "text_token_stats",
    oracle="""
        SELECT lang, tok, count(*) AS cnt
        FROM (
            SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
        )
        WHERE tok <> ''
        GROUP BY lang, tok
    """,
    group="text",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-token frequencies per language (split→explode→groupBy)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "text_lang_profile",
    oracle="""
        SELECT lang, source, count(*) AS doc_cnt,
               min(n_chars) AS min_chars, max(n_chars) AS max_chars,
               round(avg(n_chars), 4) AS avg_chars
        FROM documents
        GROUP BY lang, source
    """,
    group="text",
)
def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) document counts and char-length stats."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("doc_cnt"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@register(
    "text_quality_score",
    oracle="""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_len,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_words,
               CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
               CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT)
                   AS n_bpe_tokens,
               round(CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS DOUBLE)
                     / greatest(length(text), 1), 6) AS word_density
        FROM documents
    """,
    group="text",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: lengths, word/BPE-ish token counts,
    word density — the filter features of a pretraining quality gate."""
    d = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != "")
    n_words = F.size(words).cast("bigint")
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_len"),
        n_words.alias("n_words"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
        .cast("bigint")
        .alias("n_spaces"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_RE.replace("\\s", " ")), 0))
        .cast("bigint")
        .alias("n_bpe_tokens"),
        F.round(
            n_words.cast("double") / F.greatest(F.length("text"), F.lit(1)), 6
        ).alias("word_density"),
    )


@register(
    "text_langid_ngram",
    # Upgraded from rows-only in r6: the heuristic is pure integer
    # relational logic (trigram explode, top-200 ranking with total
    # tie-breaks, overlap count, argmax with total tie-breaks), so the
    # entire model fits in one deterministic SQL oracle.
    oracle="""
        WITH grams AS (
            SELECT doc_id, lang,
                   unnest(list_transform(
                       generate_series(1, greatest(length(text) - 2, 1)),
                       i -> substring(text, i, 3))) AS g
            FROM documents
        ), lang_counts AS (
            SELECT lang, g, count(*) AS cnt FROM grams GROUP BY lang, g
        ), profile AS (
            SELECT lang AS p_lang, g FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY lang ORDER BY cnt DESC, g) AS rk
                FROM lang_counts) t
            WHERE rk <= 200
        ), doc_grams AS (
            SELECT DISTINCT doc_id, lang, g FROM grams
        ), scores AS (
            SELECT d.doc_id, d.lang, p.p_lang,
                   CAST(count(*) AS BIGINT) AS score
            FROM doc_grams d JOIN profile p ON d.g = p.g
            GROUP BY d.doc_id, d.lang, p.p_lang
        )
        SELECT doc_id, lang, p_lang AS predicted_lang, score FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, p_lang) AS rk
            FROM scores) t
        WHERE rk = 1
    """,
    group="text",
)
def text_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-n-gram language ID (naive-Bayes-ish, trained in-corpus).

    Profiles each language's top character trigrams from the corpus
    itself (using the fixture's lang labels as supervision), then scores
    each document by trigram overlap and predicts the argmax language.
    Everything is explode/groupBy/join — an inverted-index shape that
    scales; returns (doc_id, lang, predicted_lang, score).
    """
    from desdb_spark.extensions.dedup import ensure_parallelism

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    grams = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("text") - 2, F.lit(1))),
                lambda i: F.substring(F.col("text"), i, 3),
            )
        ).alias("g"),
    )
    # r12b single-pass rework (playbook: a frame consumed twice executes
    # its plan twice): the raw gram stream used to be exploded once for
    # the profile counts and AGAIN for the per-doc distinct gram set —
    # two full corpus explode+substring passes. Now ONE pass collapses
    # to per-doc gram counts (map-side combine does the per-doc distinct
    # before the exchange — a doc's grams are colocated by explode) and
    # is checkpointed; the profile re-aggregates those counts by lang
    # (sum of per-doc counts ≡ raw occurrence counts) and the scoring
    # side reads the same frame's keys (per-doc-distinct by
    # construction).
    per_doc = (
        grams.groupBy("doc_id", "lang", "g")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    # Top-200 trigrams per language form its profile.
    lang_counts = per_doc.groupBy("lang", "g").agg(F.sum("c").alias("cnt"))
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("g"))
    profile = (
        lang_counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 200)
        .select(F.col("lang").alias("p_lang"), "g")
    )
    scores = (
        per_doc.select("doc_id", "lang", "g")
        .join(F.broadcast(profile), "g")
        .groupBy("doc_id", "lang", "p_lang")
        .agg(F.count("*").alias("score"))
    )
    w2 = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("p_lang"))
    return (
        scores.withColumn("rk", F.row_number().over(w2))
        .where(F.col("rk") == 1)
        .select("doc_id", "lang", F.col("p_lang").alias("predicted_lang"), "score")
        .orderBy("doc_id")
    )


@register(
    "text_fingerprint",
    oracle="""
        SELECT doc_id, md5(text) AS content_md5,
               CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS content_hash64
        FROM documents
    """,
    group="text",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: md5 digest plus a 64-bit integer fingerprint.

    Engine-native 64-bit hashes differ across engines (Spark xxhash64 vs
    DuckDB hash), so the integer fingerprint derives from the md5 prefix —
    portable and hash-checked on both sides.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint").alias(
            "content_hash64"
        ),
    )


@register(
    "pipeline_quality_filter",
    oracle="""
        WITH scored AS (
            SELECT doc_id, lang, source, n_chars, text,
                   CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                        AS BIGINT) AS n_words,
                   round(CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                              AS DOUBLE) / greatest(length(text), 1), 6) AS word_density
            FROM documents
        )
        SELECT doc_id, lang, source, n_chars, n_words, word_density
        FROM scored
        WHERE n_chars >= 100 AND word_density >= 0.05
        QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    """,
    group="text",
)
def pipeline_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite C4-style pretraining gate: score → filter → exact-dedup.

    One declarative plan chaining the pipeline stages a training-data pass
    runs per shard: per-document quality signals (length, word count, word
    density), threshold filters, then keep-first exact dedup on the content
    digest (row_number over md5(text), min doc_id wins). All built-in
    expressions: the filters prune before the dedup shuffle, and the only
    shuffle key is the digest — payload text never shuffles twice.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != "")
    n_words = F.size(words).cast("bigint")
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "text",
        n_words.alias("n_words"),
        F.round(
            n_words.cast("double") / F.greatest(F.length("text"), F.lit(1)), 6
        ).alias("word_density"),
    )
    filtered = scored.where((F.col("n_chars") >= 100) & (F.col("word_density") >= 0.05))
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        filtered.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("doc_id", "lang", "source", "n_chars", "n_words", "word_density")
    )


@register(
    "text_langid_confusion",
    # The confusion matrix of the in-corpus trigram language identifier:
    # the same deterministic relational model as text_langid_ngram's
    # oracle, aggregated to (true, predicted) counts — the evaluation
    # artifact a pipeline monitors when the identifier gates routing.
    oracle="""
        WITH grams AS (
            SELECT doc_id, lang,
                   unnest(list_transform(
                       generate_series(1, greatest(length(text) - 2, 1)),
                       i -> substring(text, i, 3))) AS g
            FROM documents
        ), lang_counts AS (
            SELECT lang, g, count(*) AS cnt FROM grams GROUP BY lang, g
        ), profile AS (
            SELECT lang AS p_lang, g FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY lang ORDER BY cnt DESC, g) AS rk
                FROM lang_counts) t
            WHERE rk <= 200
        ), doc_grams AS (
            SELECT DISTINCT doc_id, lang, g FROM grams
        ), scores AS (
            SELECT d.doc_id, d.lang, p.p_lang, count(*) AS score
            FROM doc_grams d JOIN profile p ON d.g = p.g
            GROUP BY d.doc_id, d.lang, p.p_lang
        ), best AS (
            SELECT doc_id, lang, p_lang FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, p_lang) AS rk
                FROM scores) t
            WHERE rk = 1
        )
        SELECT lang AS true_lang, p_lang AS predicted_lang,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM best GROUP BY lang, p_lang
    """,
    group="text",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the trigram language identifier: document
    counts per (true lang, predicted lang) cell. The diagonal mass is
    the identifier's accuracy; off-diagonal cells name the confusable
    pairs — the evaluation readout that decides whether the langid gate
    is safe to route on.

    Scale shape: identical plan to text_langid_ngram up to the final
    aggregate (profile broadcast, inverted-index scoring, per-doc
    argmax), then one tiny (langs × langs) count — evaluation is free
    once prediction is relational.
    """
    pred = text_langid_ngram(spark, sf_dir)
    return pred.groupBy(
        F.col("lang").alias("true_lang"),
        F.col("predicted_lang"),
    ).agg(F.count("*").cast("bigint").alias("n_docs"))
