"""Round-7: filter-threshold calibration — choosing the knob, not just
applying it. Every corpus pipeline has a min-length (and min-quality)
filter; the operational question is what cutoff keeps the token budget.
These ops compute that exactly from one per-length aggregate: the
retention curve over a cutoff grid, and the largest cutoff that still
retains a target token share.

Scale shape for both: one explode-free groupBy(length) collapses the
corpus to ≤ a-few-hundred rows (distinct lengths), and everything after
— grid expansion, cumulative windows, the arg-max pick — runs on that
tiny aggregate. The corpus is scanned once, projected to one integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Candidate min-token-count cutoffs for the retention curve.
CUTOFF_GRID = (8, 16, 32, 64, 128)
#: Token share the calibrated threshold must retain (as num/den — the
#: comparison stays in exact integers, never total * 0.8 in decimal).
TARGET_NUM, TARGET_DEN = 8, 10

_LEN_SQL = "len(list_filter(string_split(text, ' '), x -> x <> ''))"


@register(
    "corpus_length_retention_curve",
    oracle=f"""
        WITH lens AS (
            SELECT CAST({_LEN_SQL} AS BIGINT) AS n_words FROM documents
        ), per_len AS (
            SELECT n_words, CAST(count(*) AS BIGINT) AS docs,
                   CAST(sum(n_words) AS BIGINT) AS toks
            FROM lens GROUP BY n_words
        ), tot AS (
            SELECT CAST(sum(docs) AS BIGINT) AS d,
                   CAST(sum(toks) AS BIGINT) AS t
            FROM per_len
        )
        SELECT g.cutoff,
               CAST(coalesce(sum(docs), 0) AS BIGINT) AS docs_kept,
               CAST(coalesce(sum(toks), 0) AS BIGINT) AS tokens_kept,
               round(CAST(coalesce(sum(toks), 0) AS DOUBLE)
                     / (SELECT t FROM tot), 6) AS token_share,
               round(CAST(coalesce(sum(docs), 0) AS DOUBLE)
                     / (SELECT d FROM tot), 6) AS doc_share
        FROM (VALUES {', '.join(f'({c})' for c in CUTOFF_GRID)}) AS g(cutoff)
        LEFT JOIN per_len ON per_len.n_words >= g.cutoff
        GROUP BY g.cutoff
    """,
    group="calibration_ext",
)
def corpus_length_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc/token retention at each candidate min-length cutoff — the
    curve an operator reads before setting the length filter.

    The grid expansion is a per-row ``explode`` over the (few-hundred-
    row) per-length aggregate — a Generate, never a join — and the
    conditional keep is a filter + re-aggregate on cutoff."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    per_len = (
        d.select(n_words.cast("bigint").alias("n_words"))
        .groupBy("n_words")
        .agg(
            F.count("*").cast("bigint").alias("docs"),
            F.sum("n_words").cast("bigint").alias("toks"),
        )
    )
    tot = per_len.agg(
        F.sum("docs").cast("bigint"), F.sum("toks").cast("bigint")
    ).first()
    total_docs, total_toks = tot[0], tot[1]  # driver scalars (exact ints)
    grid = F.array(*[F.lit(c) for c in CUTOFF_GRID])
    return (
        per_len.select("n_words", "docs", "toks", F.explode(grid).alias("cutoff"))
        .groupBy("cutoff")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("n_words") >= F.col("cutoff"), F.col("docs"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("docs_kept"),
            F.coalesce(
                F.sum(F.when(F.col("n_words") >= F.col("cutoff"), F.col("toks"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tokens_kept"),
        )
        .select(
            "cutoff",
            "docs_kept",
            "tokens_kept",
            F.round(
                F.col("tokens_kept").cast("double") / F.lit(total_toks), 6
            ).alias("token_share"),
            F.round(
                F.col("docs_kept").cast("double") / F.lit(total_docs), 6
            ).alias("doc_share"),
        )
    )


@register(
    "corpus_length_cutoff_calibrate",
    oracle=f"""
        WITH lens AS (
            SELECT CAST({_LEN_SQL} AS BIGINT) AS n_words FROM documents
        ), per_len AS (
            SELECT n_words, CAST(count(*) AS BIGINT) AS docs,
                   CAST(sum(n_words) AS BIGINT) AS toks
            FROM lens GROUP BY n_words
        ), cum AS (
            SELECT n_words,
                   sum(docs) OVER (ORDER BY n_words DESC) AS cdocs,
                   sum(toks) OVER (ORDER BY n_words DESC) AS ctoks,
                   (SELECT CAST(sum(toks) AS BIGINT) FROM per_len) AS total
            FROM per_len
        )
        SELECT CAST(max(n_words) AS BIGINT) AS cutoff,
               CAST(max_by(cdocs, n_words) AS BIGINT) AS docs_kept,
               CAST(max_by(ctoks, n_words) AS BIGINT) AS tokens_kept,
               round(CAST(max_by(ctoks, n_words) AS DOUBLE) / max(total), 6)
                   AS token_share
        FROM cum
        WHERE ctoks * {TARGET_DEN} >= total * {TARGET_NUM}
    """,
    group="calibration_ext",
)
def corpus_length_cutoff_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LARGEST min-length cutoff whose kept-docs (n_words ≥ cutoff)
    still retain ≥ {TARGET_NUM}/{TARGET_DEN} of all tokens — computed
    from the descending cumulative token sum over the per-length
    aggregate. The target comparison is pure integer arithmetic
    (ctoks·den ≥ total·num), immune to the DECIMAL-literal trap."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    per_len = (
        d.select(n_words.cast("bigint").alias("n_words"))
        .groupBy("n_words")
        .agg(
            F.count("*").cast("bigint").alias("docs"),
            F.sum("n_words").cast("bigint").alias("toks"),
        )
    )
    w = Window.orderBy(F.desc("n_words"))
    cum = per_len.select(
        "n_words",
        F.sum("docs").over(w).alias("cdocs"),
        F.sum("toks").over(w).alias("ctoks"),
        F.sum("toks").over(Window.partitionBy()).alias("total"),
    )
    ok = cum.where(
        F.col("ctoks") * TARGET_DEN >= F.col("total") * TARGET_NUM
    )
    return ok.agg(
        F.max("n_words").cast("bigint").alias("cutoff"),
        F.max_by("cdocs", "n_words").cast("bigint").alias("docs_kept"),
        F.max_by("ctoks", "n_words").cast("bigint").alias("tokens_kept"),
        F.round(
            F.max_by("ctoks", "n_words").cast("double") / F.max("total"), 6
        ).alias("token_share"),
    )
