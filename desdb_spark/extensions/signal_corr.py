"""Round-8e: quality-signal agreement — Pearson correlation between the
bigram-LM fluency score and document length, from exact integer
sufficient statistics.

The production question (public practice — filter-ablation sections of
CCNet/Gopher/RefinedWeb): when a pipeline stacks quality signals, are
they measuring different things, or is the expensive one (LM
perplexity) just re-discovering the cheap one (length)? |r| near 1
means the LM filter is redundant; near 0 means it adds information.

Float discipline: both signals are exact integers (lp in tenth-millis
via the ccnet_buckets quantization; length in whitespace words), the
six sufficient statistics are exact integer sums (the
stat_linear_regression pattern), and r is then ONE deterministic
double expression over identical exact integers — IEEE sqrt/divide on
equal inputs, rounded at 6 dp. Covariance terms are computed in
DECIMAL(38,0)/HUGEINT (n·Σxy overflows int64 past ~1e5 docs of this
magnitude) before the final double cast.

Scale shape: scoring is the lm_score plan; everything after is one
doc-grain equi-join plus a single 6-way aggregate — at 100 TB the
whole diagnostic costs one pass over the per-doc score table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.extensions.lm_score import SCORED_CTE, scored_bigrams
from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "quality_signal_correlation",
    oracle=SCORED_CTE
    + """
        , per_doc AS (
            SELECT doc_id,
                   CAST(round(round(avg(lp), 4) * 10000, 0) AS BIGINT)
                       AS x
            FROM scored GROUP BY doc_id
        ), joined AS (
            SELECT p.x,
                   CAST(len(list_filter(string_split(d.text, ' '),
                                        t -> t <> '')) AS BIGINT) AS y
            FROM per_doc p JOIN documents d USING (doc_id)
        ), sums AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM joined
        )
        SELECT n AS n_docs, sx AS sum_lp_tm, sy AS sum_words,
               sxx AS sum_lp_sq, syy AS sum_words_sq, sxy AS sum_cross,
               round(
                   CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
                        AS DOUBLE)
                   / sqrt(CAST((CAST(n AS HUGEINT) * sxx
                                - CAST(sx AS HUGEINT) * sx)
                               * (CAST(n AS HUGEINT) * syy
                                  - CAST(sy AS HUGEINT) * sy)
                          AS DOUBLE)), 6) AS pearson_r
        FROM sums
    """,
    group="signal_corr",
)
def quality_signal_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-row agreement report between mean bigram log-probability
    (x, exact tenth-millis) and document word count (y): the six exact
    integer sufficient statistics and Pearson r rounded at 6 dp."""
    per_doc = (
        scored_bigrams(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.round(F.round(F.avg("lp"), 4) * 10000, 0)
            .cast("bigint")
            .alias("x")
        )
    )
    words = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != ""))
        .cast("bigint")
        .alias("y"),
    )
    sums = (
        per_doc.join(words, "doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        )
    )
    r = F.round(
        F.expr(
            "CAST(CAST(n AS DECIMAL(38,0)) * sxy"
            " - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)"
        )
        / F.sqrt(
            F.expr(
                "CAST((CAST(n AS DECIMAL(38,0)) * sxx"
                " - CAST(sx AS DECIMAL(38,0)) * sx)"
                " * (CAST(n AS DECIMAL(38,0)) * syy"
                " - CAST(sy AS DECIMAL(38,0)) * sy) AS DOUBLE)"
            )
        ),
        6,
    )
    return sums.select(
        F.col("n").alias("n_docs"),
        F.col("sx").alias("sum_lp_tm"),
        F.col("sy").alias("sum_words"),
        F.col("sxx").alias("sum_lp_sq"),
        F.col("syy").alias("sum_words_sq"),
        F.col("sxy").alias("sum_cross"),
        r.alias("pearson_r"),
    )
