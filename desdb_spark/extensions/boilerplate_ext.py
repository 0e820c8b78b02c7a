"""Round-7: boilerplate detection — the C4/CCNet curation step that
finds templated spans (nav bars, license headers, cookie banners)
repeated across documents. Boilerplate is an n-gram window whose
DOCUMENT frequency is abnormally high: unlike near-dup detection (whole
documents similar), this catches the fragment every crawler page
shares. The detected grams drive span-level removal downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Window width and the document-frequency floor for "boilerplate".
NGRAM = 5
MIN_DF = 3
TOP_N = 50


@register(
    "docs_boilerplate_ngrams",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), grams AS (
            SELECT doc_id, array_to_string(t[i:i+{NGRAM - 1}], ' ') AS g
            FROM toks, unnest(range(1, len(t) - {NGRAM - 2})) AS r(i)
        )
        SELECT g AS gram,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
               CAST(count(*) AS BIGINT) AS occurrences
        FROM grams
        GROUP BY g
        HAVING count(DISTINCT doc_id) >= {MIN_DF}
        ORDER BY df DESC, gram
        LIMIT {TOP_N}
    """,
    group="boilerplate_ext",
)
def docs_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_N} {NGRAM}-token windows by cross-document frequency
    (df ≥ {MIN_DF}): each with its document frequency and total
    occurrence count — the candidate boilerplate spans.

    Scale shape: gram construction is a pure-codegen
    ``transform(sequence(...))`` lambda over the token array (no
    Python, no join) exploded into (doc, gram) rows; map-side combine
    absorbs within-doc repetition before the shuffle, and the df floor
    prunes the long tail inside the aggregate. At 100 TB the gram would
    be a 64-bit rolling hash instead of the string (text_fingerprint's
    kernel) so the shuffle carries 8 bytes per window, and the df floor
    becomes a count-min prefilter; the relational shape is unchanged.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    t = F.col("t")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(NGRAM - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, NGRAM)),
    )
    exploded = (
        d.select("doc_id", toks.alias("t"))
        .where(F.size("t") >= NGRAM)
        .select("doc_id", F.explode(grams).alias("gram"))
    )
    return (
        exploded.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("df"),
            F.count("*").cast("bigint").alias("occurrences"),
        )
        .where(F.col("df") >= MIN_DF)
        .orderBy(F.desc("df"), "gram")
        .limit(TOP_N)
    )
