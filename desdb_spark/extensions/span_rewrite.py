"""Round-8: repeated-span REMOVAL — the rewrite pass that consumes
``dedup_exact_substring_spans``'s extents (Lee et al. 2021: after
locating cross-document repeated substrings, the pipeline deletes those
ranges from every document and trains on the rewrite). Shares the span
operator's gram constants (SPAN_K / MIN_DF from span_dedup) so the two
ops describe the same repeated regions; this one emits the per-document
rewrite summary: tokens kept/removed and the md5 digest of the cleaned
text (the digest makes the whole rewritten document part of the hashed
contract without shipping it — line_dedup's discipline, at the span
grain).

Scale shape: hit windows expand to covered token indices via a ×SPAN_K
explode on the hit grain (the events_dau_wau_stickiness pattern — a
constant fan-out beats any range join), the covered-set is distinct'd
with map-side combine, and removal is one left-anti equi-join on
(doc_id, pos) against the token stream; reassembly is one groupBy(doc).
No island merge needed: removal only needs coverage, not extents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.extensions.span_dedup import MIN_DF, SPAN_K
from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "docs_strip_repeated_spans",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), tok AS (
            SELECT doc_id, i - 1 AS pos, t[i] AS w
            FROM toks, unnest(range(1, len(t) + 1)) AS r(i)
        ), grams AS (
            SELECT doc_id, i - 1 AS start,
                   array_to_string(t[i:i+{SPAN_K - 1}], ' ') AS g
            FROM toks, unnest(range(1, len(t) - {SPAN_K - 2})) AS r(i)
        ), rep AS (
            SELECT g FROM grams GROUP BY g
            HAVING count(DISTINCT doc_id) >= {MIN_DF}
        ), covered AS (
            SELECT DISTINCT h.doc_id, h.start + o.j AS pos
            FROM (SELECT doc_id, start FROM grams
                  WHERE g IN (SELECT g FROM rep)) h,
                 unnest(range(0, {SPAN_K})) AS o(j)
        ), kept AS (
            SELECT tok.doc_id, tok.pos, tok.w
            FROM tok LEFT JOIN covered
              ON tok.doc_id = covered.doc_id AND tok.pos = covered.pos
            WHERE covered.pos IS NULL
        ), re AS (
            SELECT doc_id, count(*) AS n_kept,
                   string_agg(w, ' ' ORDER BY pos) AS kept_text
            FROM kept GROUP BY doc_id
        ), totals AS (
            SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(t.n_tokens AS BIGINT) AS n_tokens,
               CAST(t.n_tokens - coalesce(re.n_kept, 0) AS BIGINT)
                   AS n_removed,
               md5(coalesce(re.kept_text, '')) AS kept_md5
        FROM totals t LEFT JOIN re USING (doc_id)
        ORDER BY t.doc_id
    """,
    group="span_rewrite",
)
def docs_strip_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rewrite after removing every token covered by a
    cross-document repeated {SPAN_K}-gram window (df ≥ {MIN_DF}): total
    tokens, tokens removed, and the md5 of the cleaned text."""
    d = load_table(spark, sf_dir, "documents")
    toks_col = F.filter(F.split("text", " "), lambda x: x != "")
    t = F.col("t")
    base = d.select("doc_id", toks_col.alias("t"))
    tok = base.select(
        "doc_id", F.posexplode(t).alias("pos", "w")
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(SPAN_K - 1)),
        lambda i: F.struct(
            (i - 1).cast("long").alias("start"),
            F.concat_ws(" ", F.slice(t, i, SPAN_K)).alias("g"),
        ),
    )
    exploded = (
        base.where(F.size("t") >= SPAN_K)
        .select("doc_id", F.explode(grams).alias("x"))
        .select("doc_id", F.col("x.start").alias("start"), F.col("x.g").alias("g"))
    )
    rep = (
        exploded.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= MIN_DF)
        .select("g")
    )
    covered = (
        exploded.join(rep, "g")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (SPAN_K - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    kept = tok.join(covered, ["doc_id", "pos"], "left_anti")
    re = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s.w,
            ),
            " ",
        ).alias("kept_text"),
    )
    totals = tok.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    return (
        totals.join(re, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
            F.md5(F.coalesce("kept_text", F.lit(""))).alias("kept_md5"),
        )
        .orderBy("doc_id")
    )
