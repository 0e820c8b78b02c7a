"""Corpus and time-series analytics (round 4 batch 5).

The next tier of training-data-pipeline questions over the documents /
events / embeddings fixtures [desdb:bin/des-query arbitrary SQL —
reconstructed, SURVEY.md §0 / §2A A1]: TF-IDF term ranking, corpus bigram
frequency, event-type transition matrices, exponentially-weighted daily
trend smoothing, and per-dimension embedding statistics. Everything is
built-in-expression work (split / explode / posexplode / window / groupBy)
— no Python row path anywhere.

Determinism per SURVEY.md §5.3: counts are exact; float outputs rounded
(scores 6 dp, EWMA 4 dp) and every ranking orders by the ROUNDED value
plus a total tie-break so both engines rank identical doubles. The EWMA
uses alpha = 0.5 so every power term is a power of two — the whole
recurrence is exact binary arithmetic, bitwise-identical across engines.
``events.ts`` arrives through the session nanos shim (session.py
load_table); oracles order by ``CAST(ts AS TIMESTAMP)`` so the micro-vs-
nano tail never affects tie-breaking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "text_tfidf_topk",
    oracle="""
        WITH tf AS (
          SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents)
          WHERE word <> ''
          GROUP BY doc_id, word),
        df AS (
          SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word),
        scored AS (
          SELECT doc_id, word, tf,
                 round(tf * ln((SELECT count(*) FROM documents)
                               / CAST(df AS DOUBLE)), 6) AS score
          FROM tf JOIN df USING (word))
        SELECT doc_id, word, tf, score
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, word) AS rk
              FROM scored)
        WHERE rk <= 3
    """,
    group="corpus_timeseries",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document — the classic relevance ranking
    behind keyword extraction and quality filtering in a training-data
    pipeline.

    Scale shape: tokenize-explode fans out once; the (doc, word) tf
    aggregate partial-aggregates map-side before its shuffle; document
    frequency reuses the tf aggregate (one row per doc-word, so df is a
    plain count — no second pass over raw text). The corpus size N is a
    SQL ``ScalarSubquery`` (own tiny job, inlined as a literal — no
    constant-key join / BNLJ). The ranking window partitions by doc_id —
    never a global sort — and orders by the ROUNDED score with a word
    tie-break so both engines pick identical rows.
    """
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "tfidf_documents"
    )
    return spark.sql(
        """
        WITH tf AS (
          SELECT doc_id, word, count(*) AS tf
          FROM (SELECT doc_id, explode(split(text, ' ')) AS word
                FROM tfidf_documents)
          WHERE word <> ''
          GROUP BY doc_id, word),
        df AS (
          SELECT word, count(*) AS df FROM tf GROUP BY word),
        scored AS (
          SELECT doc_id, word, tf,
                 round(tf * ln((SELECT count(*) FROM tfidf_documents)
                               / CAST(df AS DOUBLE)), 6) AS score
          FROM tf JOIN df USING (word))
        SELECT doc_id, word, tf, score
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, word) AS rk
              FROM scored)
        WHERE rk <= 3
        """
    )


@register(
    "text_bigram_topk",
    oracle="""
        SELECT bigram, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT a || ' ' || b AS bigram
              FROM (SELECT unnest(w[:len(w)-1]) AS a,
                           unnest(w[2:]) AS b
                    FROM (SELECT string_split(text, ' ') AS w
                          FROM documents)))
        GROUP BY bigram
        ORDER BY n DESC, bigram
        LIMIT 20
    """,
    group="corpus_timeseries",
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams — the n-gram frequency pass behind
    contamination checks and boilerplate detection.

    Scale shape: bigrams are built inside the array domain (slice +
    transform with the successor element) so each document explodes
    exactly once into len-1 rows — no self-join on token position. The
    count partial-aggregates map-side; top-20 plans as
    TakeOrderedAndProject (no global sort) with a (count DESC, bigram)
    total tie-break.
    """
    d = load_table(spark, sf_dir, "documents")
    # r12c: zip_with over the two shifted slices — the previous
    # transform-lambda indexed `split(text)[i+1]` per element, and a
    # non-lambda subtree inside a HOF lambda body is re-evaluated per
    # element (O(L²) re-splits per doc; SCALING.md §14). zip_with's
    # array arguments evaluate once per row; both slices are exactly
    # len-1 elements so no null padding occurs and the output bigram
    # list is unchanged.
    bigrams = d.select(
        F.explode(
            F.expr(
                "zip_with("
                "slice(split(text, ' '), 1, greatest(size(split(text, ' ')) - 1, 0)), "
                "slice(split(text, ' '), 2, greatest(size(split(text, ' ')) - 1, 0)), "
                "(x, y) -> concat(x, ' ', y))"
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@register(
    "events_transition_matrix",
    oracle="""
        SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT event_type,
                     lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
              FROM events)
        WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    """,
    group="corpus_timeseries",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: for each user's time-ordered stream,
    count (previous → current) event-type pairs — the first-order Markov
    view behind funnel diagnostics and bot detection.

    Scale shape: one shuffle on user_id, per-partition sort on
    (ts, event_id) — the same exchange a sessionizer uses — then lag() is
    a single-pass frame and the 25-cell matrix aggregate partial-
    aggregates map-side. The tie-break on event_id makes within-
    microsecond order total; the oracle casts its nanosecond timestamps
    to micros so both engines sort the identical key.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "events_daily_ewma",
    oracle="""
        WITH daily AS (
          SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM events
          GROUP BY 1, 2),
        seq AS (
          SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY day) AS rn
          FROM daily)
        SELECT event_type, day, n_events,
               round(0.5 * power(0.5, rn)
                     * sum(n_events * power(2.0, rn)) OVER (
                         PARTITION BY event_type ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     4) AS ewma
        FROM seq
    """,
    group="corpus_timeseries",
)
def events_daily_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event counts per
    type (alpha = 0.5, zero-init): s_t = Σ_{i≤t} α(1−α)^{t−i}·x_i — the
    standard trend smoother, expressed as a single window aggregate via
    the scaled-sum identity s_t = α(1−α)^t · Σ x_i(1−α)^{−i}.

    Scale shape: the raw stream collapses to ≤31 rows per event type
    BEFORE any window runs, so the recurrence costs one tiny partitioned
    sort — no per-event state, no iterative loop. With α = ½ every term
    is a power of two: counts ≤ 2^43 scale exactly, the running sum stays
    below 2^53, and the final product is exact binary arithmetic — both
    engines produce bit-identical doubles before the 4 dp round.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
    ).agg(F.count("*").alias("n_events"))
    seq = daily.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("event_type").orderBy("day")),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scaled_sum = F.sum(F.col("n_events") * F.pow(F.lit(2.0), F.col("rn"))).over(w)
    return seq.select(
        "event_type",
        "day",
        "n_events",
        F.round(
            0.5 * F.pow(F.lit(0.5), F.col("rn")) * scaled_sum, 4
        ).alias("ewma"),
    )


@register(
    "emb_dim_stats",
    oracle="""
        SELECT CAST(dim AS BIGINT) AS dim,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(val), 6) AS mean_val,
               round(stddev_samp(val), 6) AS std_val,
               round(CAST(min(val) AS DOUBLE), 6) AS min_val,
               round(CAST(max(val) AS DOUBLE), 6) AS max_val
        FROM (SELECT unnest(embedding) AS val,
                     unnest(range(0, len(embedding))) AS dim
              FROM embeddings)
        WHERE dim < 8
        GROUP BY 1
    """,
    group="corpus_timeseries",
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension statistics over the first 8 embedding dimensions —
    the drift / normalization audit a feature store runs on every vector
    batch (posexplode → groupBy dim).

    Scale shape: posexplode fans each vector into (pos, val) rows — the
    distributed-native layout for per-dimension reductions (a columnar
    pivot would put all N rows for one dim on one node anyway; this
    shape partial-aggregates each dimension map-side instead). The
    dim < 8 filter sits directly on the generator output, cutting the
    fan-out 8× before the shuffle; mean/std round at 6 dp, far above the
    ~1e-13 summation-order noise of unit-scale floats.
    """
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select(
        F.posexplode("embedding").alias("dim", "val")
    ).where(F.col("dim") < 8)
    return (
        exploded.groupBy(F.col("dim").cast("long").alias("dim"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("val"), 6).alias("mean_val"),
            F.round(F.stddev_samp("val"), 6).alias("std_val"),
            F.round(F.min("val").cast("double"), 6).alias("min_val"),
            F.round(F.max("val").cast("double"), 6).alias("max_val"),
        )
    )
