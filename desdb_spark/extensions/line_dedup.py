"""Round-8: global line-grain dedup with document reassembly — the C4
cleaning rule (Raffel et al. 2020, public literature): any line/span
whose exact content occurs in MORE THAN ONE document in the corpus is
boilerplate and is removed from every document, and the surviving lines
are re-joined into the cleaned text. This sits between
``docs_boilerplate_ngrams`` (which only *names* repeated grams) and
``dedup_exact_substring_spans`` (which emits per-doc extents): it
produces the actual rewritten-document summary the training pipeline
ships.

The fixture's text carries no newlines, so "lines" are fixed
{LINE_W}-token windows (stride {LINE_W}, last line ragged) — the
documented stand-in; with real newline-delimited text only the
line-splitter expression changes, the relational shape is identical.

Scale shape: line construction is pure-codegen ``transform(sequence)``
over the token array; the global line-frequency aggregate gets map-side
combine (within-doc repeats collapse before the shuffle) and its
shuffle carries line hashes at 100 TB (rolling-hash discipline, see
docs_boilerplate_ngrams); the keep/drop decision is an equi-join on the
line text; reassembly is one groupBy(doc_id) whose payload is the kept
lines only. The hashed output ships a fixed-width digest per doc, never
the rewritten text itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Tokens per pseudo-line; a line is dropped when its exact content
#: appears in >= MIN_DROP_DF distinct documents (C4: "more than once").
LINE_W = 8
MIN_DROP_DF = 2


@register(
    "docs_dedup_lines_global",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), lines AS (
            SELECT doc_id, i AS line_id,
                   array_to_string(
                       t[i*{LINE_W}+1 : i*{LINE_W}+{LINE_W}], ' ') AS lt
            FROM toks, unnest(range(0, (len(t)+{LINE_W - 1})//{LINE_W})) AS r(i)
        ), freq AS (
            SELECT lt, count(DISTINCT doc_id) AS df FROM lines GROUP BY lt
        ), kept AS (
            SELECT l.doc_id, l.line_id, l.lt
            FROM lines l JOIN freq f USING (lt)
            WHERE f.df < {MIN_DROP_DF}
        ), re AS (
            SELECT doc_id, count(*) AS n_kept,
                   string_agg(lt, ' ' ORDER BY line_id) AS kept_text
            FROM kept GROUP BY doc_id
        ), totals AS (
            SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(t.n_lines AS BIGINT) AS n_lines,
               CAST(coalesce(re.n_kept, 0) AS BIGINT) AS n_kept,
               CAST(length(coalesce(re.kept_text, '')) AS BIGINT)
                   AS kept_n_chars,
               md5(coalesce(re.kept_text, '')) AS kept_md5
        FROM totals t LEFT JOIN re USING (doc_id)
        ORDER BY t.doc_id
    """,
    group="line_dedup",
)
def docs_dedup_lines_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rewrite summary after global line dedup: total
    pseudo-lines, lines kept (those whose exact content is unique to one
    document), the rewritten text's length, and its md5 digest — the
    digest makes the whole reassembled text part of the hashed contract
    without shipping it.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    t = F.col("t")
    line_arr = F.transform(
        F.sequence(
            F.lit(0), F.ceil(F.size(t) / F.lit(LINE_W)).cast("int") - 1
        ),
        lambda i: F.concat_ws(" ", F.slice(t, i * LINE_W + 1, LINE_W)),
    )
    lines = (
        d.select("doc_id", toks.alias("t"))
        .where(F.size("t") > 0)
        .select("doc_id", F.posexplode(line_arr).alias("line_id", "lt"))
    )
    freq = (
        lines.groupBy("lt")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") < MIN_DROP_DF)
        .select("lt")
    )
    kept = lines.join(freq, "lt")
    re = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_id", "lt"))),
                lambda s: s.lt,
            ),
            " ",
        ).alias("kept_text"),
    )
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    return (
        totals.join(re, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_lines").cast("bigint").alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.length(F.coalesce("kept_text", F.lit("")))
            .cast("bigint")
            .alias("kept_n_chars"),
            F.md5(F.coalesce("kept_text", F.lit(""))).alias("kept_md5"),
        )
        .orderBy("doc_id")
    )
