"""Round-8: exact-substring span extraction — the Lee et al. 2021
("Deduplicating Training Data Makes Language Models Better", public
literature) removal grain. ``docs_boilerplate_ngrams`` *names* the
repeated n-grams; production exact dedup must go one step further and
emit, per document, the MAXIMAL repeated region's byte/token extent —
the "remove this range" instruction the rewrite pass consumes. The
suffix-array of the paper is a single-node structure; the distributed
re-expression is stride-1 k-token windows → cross-document frequency →
per-doc interval merge of the hit windows (classic gaps-and-islands),
which yields exactly the maximal token ranges every window of which is
repeated elsewhere.

Scale shape: window construction is pure-codegen ``transform(sequence)``
over the token array; the df aggregate gets map-side combine; the
hit-window join is an equi-join on the gram (at 100 TB the gram string
becomes a 64-bit rolling hash so the shuffle carries 8 bytes per
window — text_fingerprint's kernel — with a verify pass on collisions);
the interval merge is two window functions over (doc_id) partitions —
no self-join, no cross product. Output volume is bounded by the number
of *merged* spans, far below the raw window hits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Window width (tokens) and the cross-document frequency that makes a
#: window "repeated" (>= 2 distinct docs = it exists elsewhere).
SPAN_K = 5
MIN_DF = 2


@register(
    "dedup_exact_substring_spans",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), grams AS (
            SELECT doc_id, i - 1 AS start,
                   array_to_string(t[i:i+{SPAN_K - 1}], ' ') AS g
            FROM toks, unnest(range(1, len(t) - {SPAN_K - 2})) AS r(i)
        ), rep AS (
            SELECT g FROM grams GROUP BY g
            HAVING count(DISTINCT doc_id) >= {MIN_DF}
        ), hits AS (
            SELECT doc_id, start, start + {SPAN_K - 1} AS e
            FROM grams WHERE g IN (SELECT g FROM rep)
        ), marked AS (
            SELECT doc_id, start, e,
                   CASE WHEN start > coalesce(max(e) OVER (
                            PARTITION BY doc_id ORDER BY start
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), -1)
                        THEN 1 ELSE 0 END AS is_new
            FROM hits
        ), grp AS (
            SELECT doc_id, start, e,
                   sum(is_new) OVER (
                       PARTITION BY doc_id ORDER BY start
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS island
            FROM marked
        )
        SELECT doc_id,
               CAST(min(start) AS BIGINT) AS span_start,
               CAST(max(e) AS BIGINT) AS span_end,
               CAST(max(e) - min(start) + 1 AS BIGINT) AS span_tokens,
               CAST(count(*) AS BIGINT) AS n_windows
        FROM grp
        GROUP BY doc_id, island
        ORDER BY doc_id, span_start
    """,
    group="span_dedup",
)
def dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document maximal repeated token ranges: every stride-1
    {SPAN_K}-token window whose exact content occurs in >= {MIN_DF}
    distinct documents is a hit; overlapping hit windows merge into
    maximal spans (gaps-and-islands over the start positions). One row
    per (doc_id, span): 0-based token extent, width, and the number of
    repeated windows the span absorbed.

    Strictly-overlapping merge (``start <= prev_end``): stride-1 windows
    of a contiguous repeated region always overlap by {SPAN_K - 1}
    tokens, so each maximal repeated region emerges as exactly one span;
    two repeated regions separated by >= 1 unrepeated token stay
    separate spans.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    t = F.col("t")
    # (start, gram) pairs: start is the 0-based token index of the window.
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(SPAN_K - 1)),
        lambda i: F.struct(
            (i - 1).cast("long").alias("start"),
            F.concat_ws(" ", F.slice(t, i, SPAN_K)).alias("g"),
        ),
    )
    exploded = (
        d.select("doc_id", toks.alias("t"))
        .where(F.size("t") >= SPAN_K)
        .select("doc_id", F.explode(grams).alias("w"))
        .select("doc_id", F.col("w.start").alias("start"), F.col("w.g").alias("g"))
    )
    rep = (
        exploded.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= MIN_DF)
        .select("g")
    )
    hits = exploded.join(rep, "g").select(
        "doc_id", "start", (F.col("start") + (SPAN_K - 1)).alias("e")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = hits.withColumn(
        "is_new",
        F.when(
            F.col("start") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("island", F.sum("is_new").over(w_cum))
    return (
        marked.groupBy("doc_id", "island")
        .agg(
            F.min("start").cast("bigint").alias("span_start"),
            F.max("e").cast("bigint").alias("span_end"),
            (F.max("e") - F.min("start") + 1).cast("bigint").alias("span_tokens"),
            F.count("*").cast("bigint").alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "span_tokens", "n_windows")
        .orderBy("doc_id", "span_start")
    )
