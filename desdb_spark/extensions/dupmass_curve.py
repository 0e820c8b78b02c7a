"""Round-8e: duplicate-mass curve by n-gram length — at which
granularity does the corpus repeat itself? For each n in 1..{MAX_N},
the share of n-gram INSTANCES that are repeats of an earlier instance
(instances − distinct)/instances — unigram level measures vocabulary
reuse (always high), 5-gram level measures boilerplate/near-dup mass
(the C4/Lee-et-al signal). The curve's decay rate is the corpus's
repetition fingerprint: clean prose falls off fast, template-heavy
crawl stays flat.

Complements the point telemetries around it: docs_boilerplate_ngrams
(WHICH 5-grams repeat), text_ngram_novelty_curve (WHEN novelty
arrives), dedup_* (WHAT to delete) — this is the one-glance summary a
curation run reads first.

Scale shape: all {MAX_N} gram lengths explode in ONE pass (a
per-length transform unioned before the shuffle, each instance tagged
with its n) and reduce through a single map-side-combinable
groupBy(n, gram) → groupBy(n) cascade — one corpus-sized shuffle keyed
by (n, gram-hash at 100 TB), one tiny one. Exact integers and floor
micros throughout.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Largest gram length on the curve.
MAX_N = 5


def _grams_sql(n: int) -> str:
    return f"""
            SELECT {n} AS n,
                   array_to_string(t[i:i+{n - 1}], ' ') AS g
            FROM toks, unnest(range(1, len(t) - {n - 2})) AS r(i)
    """


@register(
    "corpus_dup_mass_by_ngram_len",
    oracle=f"""
        WITH toks AS (
            SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), grams AS (
            {" UNION ALL ".join(_grams_sql(n) for n in range(1, MAX_N + 1))}
        ), per_gram AS (
            SELECT n, g, CAST(count(*) AS BIGINT) AS c
            FROM grams GROUP BY n, g
        )
        SELECT CAST(n AS INTEGER) AS n,
               CAST(sum(c) AS BIGINT) AS instances,
               CAST(count(*) AS BIGINT) AS distinct_grams,
               CAST(sum(c) - count(*) AS BIGINT) AS dup_instances,
               CAST((sum(c) - count(*)) * 1000000 // sum(c) AS BIGINT)
                   AS dup_share_micros
        FROM per_gram GROUP BY n ORDER BY n
    """,
    group="dupmass_curve",
)
def corpus_dup_mass_by_ngram_len(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """For each gram length n in 1..{MAX_N}: total instances, distinct
    grams, repeated instances (each gram's occurrences beyond its
    first), and the duplicate share in exact floor micros."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.filter(F.split("text", " "), lambda x: x != "").alias("t")
    )
    t = F.col("t")

    def grams(n: int):
        g = F.transform(
            F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        )
        return (
            toks.where(F.size("t") >= n)
            .select(F.lit(n).alias("n"), F.explode(g).alias("g"))
        )

    all_grams = reduce(
        DataFrame.unionByName, (grams(n) for n in range(1, MAX_N + 1))
    )
    per_gram = all_grams.groupBy("n", "g").agg(
        F.count("*").cast("bigint").alias("c")
    )
    return (
        per_gram.groupBy("n")
        .agg(
            F.sum("c").cast("bigint").alias("instances"),
            F.count("*").cast("bigint").alias("distinct_grams"),
        )
        .select(
            F.col("n").cast("int").alias("n"),
            "instances",
            "distinct_grams",
            (F.col("instances") - F.col("distinct_grams"))
            .cast("bigint")
            .alias("dup_instances"),
            # Integer DIV on DECIMAL(38,0), not floor(double division)
            # (ADVICE r8): gram-instance counts ×10⁶ cross 2^53 well
            # below corpus scale; DECIMAL div matches the oracle's //
            # exactly at any scale.
            F.expr(
                "CAST((CAST(instances - distinct_grams AS DECIMAL(38,0))"
                " * 1000000) div instances AS BIGINT)"
            ).alias("dup_share_micros"),
        )
        .orderBy("n")
    )
