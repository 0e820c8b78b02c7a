"""Round-8: the Gopher quality-rule census (Rae et al. 2021, public
literature) — the canonical multi-rule document filter production
pretraining pipelines run, with PER-RULE failure attribution rather
than a single pass/fail bit: when retention drops, the first question
is always "which rule?".

Rules (document grain; the two line-level rules from the paper are
omitted because the fixture corpus is single-line — noted here rather
than silently approximated):

  R1 word_count            50 ≤ n_words ≤ 100 000
  R2 mean_word_len         3 ≤ mean word length ≤ 10
  R3 hash_symbol_ratio     '#' count / n_words ≤ 0.1
  R4 ellipsis_ratio        '...' count / n_words ≤ 0.1
  R5 alpha_word_frac       ≥ 80% of words contain a letter
  R6 stopword_presence     ≥ 2 distinct common stopwords present

Scale shape: every rule is whole-stage-codegen string/array arithmetic
over one corpus scan; the census is a single aggregate (per-rule fail
sums in one pass, unpivoted to rows) — no shuffle carries documents,
only the final handful of counters. Ratios are reported in exact
integer micros so the hash is division-order-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_SW_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


@register(
    "docs_quality_gopher_rules",
    oracle=f"""
        WITH feats AS (
            SELECT
                len(list_filter(string_split(text, ' '), w -> w <> ''))
                    AS n_words,
                list_sum(list_transform(
                    list_filter(string_split(text, ' '), w -> w <> ''),
                    w -> len(w))) AS sum_wlen,
                len(text) - len(replace(text, '#', '')) AS n_hash,
                (len(text) - len(replace(text, '...', ''))) / 3 AS n_ellipsis,
                len(list_filter(
                    list_filter(string_split(text, ' '), w -> w <> ''),
                    w -> regexp_matches(w, '[a-zA-Z]'))) AS n_alpha_words,
                len(list_intersect(
                    list_distinct(
                        list_filter(string_split(text, ' '), w -> w <> '')),
                    {_SW_SQL})) AS n_stop
            FROM documents
        ), flags AS (
            SELECT
                CASE WHEN n_words BETWEEN 50 AND 100000
                     THEN 0 ELSE 1 END AS f1,
                CASE WHEN n_words > 0
                      AND CAST(sum_wlen AS DOUBLE) / n_words
                          BETWEEN CAST(3 AS DOUBLE) AND CAST(10 AS DOUBLE)
                     THEN 0 ELSE 1 END AS f2,
                CASE WHEN n_words > 0
                      AND CAST(n_hash AS DOUBLE) / n_words
                          <= CAST(0.1 AS DOUBLE)
                     THEN 0 ELSE 1 END AS f3,
                CASE WHEN n_words > 0
                      AND CAST(n_ellipsis AS DOUBLE) / n_words
                          <= CAST(0.1 AS DOUBLE)
                     THEN 0 ELSE 1 END AS f4,
                CASE WHEN n_words > 0
                      AND CAST(n_alpha_words AS DOUBLE) / n_words
                          >= CAST(0.8 AS DOUBLE)
                     THEN 0 ELSE 1 END AS f5,
                CASE WHEN n_stop >= 2 THEN 0 ELSE 1 END AS f6
            FROM feats
        ), wide AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(f1) AS BIGINT) AS x1,
                   CAST(sum(f2) AS BIGINT) AS x2,
                   CAST(sum(f3) AS BIGINT) AS x3,
                   CAST(sum(f4) AS BIGINT) AS x4,
                   CAST(sum(f5) AS BIGINT) AS x5,
                   CAST(sum(f6) AS BIGINT) AS x6,
                   CAST(sum(CASE WHEN f1+f2+f3+f4+f5+f6 = 0
                                 THEN 0 ELSE 1 END) AS BIGINT) AS xall
            FROM flags
        )
        SELECT u.rule, w.n_docs, u.n_fail,
               CAST(u.n_fail * 1000000 / w.n_docs AS BIGINT)
                   AS fail_micros
        FROM wide w, (
            SELECT 'R1_word_count' AS rule, x1 AS n_fail FROM wide
            UNION ALL SELECT 'R2_mean_word_len', x2 FROM wide
            UNION ALL SELECT 'R3_hash_symbol_ratio', x3 FROM wide
            UNION ALL SELECT 'R4_ellipsis_ratio', x4 FROM wide
            UNION ALL SELECT 'R5_alpha_word_frac', x5 FROM wide
            UNION ALL SELECT 'R6_stopword_presence', x6 FROM wide
            UNION ALL SELECT 'ALL_RULES', xall FROM wide) u
    """,
    group="quality_gopher",
)
def docs_quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule failure census: one row per Gopher rule plus an
    ALL_RULES row — (rule, n_docs, n_fail, fail_micros). One corpus
    scan, one aggregate, rule flags unpivoted from a single wide row.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != "")
    n_words = F.size(words)
    sum_wlen = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    n_hash = F.length("text") - F.length(F.replace("text", F.lit("#")))
    n_ellipsis = (
        F.length("text") - F.length(F.replace("text", F.lit("...")))
    ) / 3
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(s) for s in STOPWORDS]),
        )
    )
    nw_d = n_words.cast("double")
    f1 = (~n_words.between(50, 100000)).cast("long")
    f2 = (
        ~((n_words > 0) & (sum_wlen.cast("double") / nw_d).between(3.0, 10.0))
    ).cast("long")
    f3 = (~((n_words > 0) & (n_hash.cast("double") / nw_d <= 0.1))).cast("long")
    f4 = (
        ~((n_words > 0) & (n_ellipsis.cast("double") / nw_d <= 0.1))
    ).cast("long")
    f5 = (
        ~((n_words > 0) & (n_alpha.cast("double") / nw_d >= 0.8))
    ).cast("long")
    f6 = (n_stop < 2).cast("long")
    flags = d.select(
        f1.alias("f1"), f2.alias("f2"), f3.alias("f3"),
        f4.alias("f4"), f5.alias("f5"), f6.alias("f6"),
    )
    any_fail = sum(F.col(f"f{i}") for i in range(1, 7))
    wide = flags.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        *[F.sum(f"f{i}").cast("bigint").alias(f"x{i}") for i in range(1, 7)],
        F.sum((any_fail > 0).cast("long")).cast("bigint").alias("xall"),
    )
    labels = [
        ("R1_word_count", "x1"), ("R2_mean_word_len", "x2"),
        ("R3_hash_symbol_ratio", "x3"), ("R4_ellipsis_ratio", "x4"),
        ("R5_alpha_word_frac", "x5"), ("R6_stopword_presence", "x6"),
        ("ALL_RULES", "xall"),
    ]
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("n_docs"),
                F.col(col).alias("n_fail"),
                (F.col(col) * 1_000_000 / F.col("n_docs"))
                .cast("bigint")
                .alias("fail_micros"),
            )
            for name, col in labels
        ]
    )
    return (
        wide.select(F.explode(rows).alias("s"))
        .select("s.*")
        .orderBy("rule")
    )
