"""Round-6 batch-20 entropy scoring and growth accounting.

- Per-document character entropy: the compression-adjacent gibberish
  detector — random byte soup scores near log₂(alphabet), stuck-key
  repetition scores near zero, and both tails are filter candidates;
  complements the word-level signals (stopword ratio, repetition
  score) with a sub-token one.
- Growth accounting / revenue waterfall: month-over-month revenue
  change decomposed into new + expansion − contraction − churned
  customer components — the decomposition every revenue dashboard
  reconciles, and an exact identity (components sum to the net change)
  the hash enforces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "text_char_entropy",
    oracle="""
        WITH chars AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, length(text)),
                       i -> substring(text, i, 1))) AS c
            FROM documents
        ), freq AS (
            SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS n
            FROM chars GROUP BY doc_id, c
        ), tot AS (
            SELECT doc_id, sum(n) AS t FROM freq GROUP BY doc_id
        )
        SELECT f.doc_id,
               CAST(count(*) AS BIGINT) AS n_distinct_chars,
               round(-sum((f.n / t.t) * log2(f.n / t.t)), 4) AS entropy_bits
        FROM freq f JOIN tot t ON f.doc_id = t.doc_id
        GROUP BY f.doc_id
        ORDER BY entropy_bits, f.doc_id LIMIT 40
    """,
    group="analytics_ext4",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 40 lowest-character-entropy documents: per doc, distinct
    character count and Shannon entropy in bits over the character
    distribution — the sub-token gibberish/repetition detector (near 0
    = stuck-key junk; near log₂|alphabet| = random bytes; prose sits in
    a narrow band between).

    Scale shape: the char explode is the only fan-out (length(text)
    rows per doc, all narrow); frequencies combine map-side per
    (doc, char); entropy is one grouped sum of p·log p terms. Per-doc
    keys mean no skew possible beyond one document's length. log2 is
    libm, rounded at 4 dp — far above cross-engine ulp drift; the
    p = n/t division happens identically on both engines from exact
    integer counts.
    """
    d = load_table(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text")),
                lambda i: F.substring(F.col("text"), i, 1),
            )
        ).alias("c"),
    )
    freq = chars.groupBy("doc_id", "c").agg(
        F.count("*").cast("double").alias("n")
    )
    tot = freq.groupBy("doc_id").agg(F.sum("n").alias("t"))
    p = F.col("n") / F.col("t")
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_distinct_chars"),
            F.round(-F.sum(p * F.log2(p)), 4).alias("entropy_bits"),
        )
        .orderBy("entropy_bits", "doc_id")
        .limit(40)
    )


@register(
    "analytics_growth_accounting",
    oracle="""
        WITH monthly AS (
            SELECT o_custkey AS cust,
                   date_trunc('month', o_orderdate) AS m,
                   CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS rev_cents
            FROM orders GROUP BY 1, 2
        ), paired AS (
            SELECT coalesce(c.cust, p.cust) AS cust,
                   coalesce(c.m, p.m + INTERVAL 1 MONTH) AS m,
                   coalesce(c.rev_cents, 0) AS cur,
                   coalesce(p.rev_cents, 0) AS prev
            FROM monthly c
            FULL OUTER JOIN monthly p
              ON c.cust = p.cust AND c.m = p.m + INTERVAL 1 MONTH
        )
        SELECT CAST(m AS DATE) AS month,
               CAST(sum(CASE WHEN prev = 0 THEN cur ELSE 0 END) AS BIGINT)
                   AS new_cents,
               CAST(sum(CASE WHEN prev > 0 AND cur > prev
                             THEN cur - prev ELSE 0 END) AS BIGINT)
                   AS expansion_cents,
               CAST(sum(CASE WHEN cur > 0 AND cur < prev
                             THEN prev - cur ELSE 0 END) AS BIGINT)
                   AS contraction_cents,
               CAST(sum(CASE WHEN cur = 0 THEN prev ELSE 0 END) AS BIGINT)
                   AS churned_cents,
               CAST(sum(cur - prev) AS BIGINT) AS net_change_cents
        FROM paired
        GROUP BY m
        ORDER BY net_change_cents DESC, month LIMIT 24
    """,
    group="analytics_ext4",
)
def analytics_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue waterfall for the 24 strongest months: month-over-month
    change per customer classified as new (no revenue last month),
    expansion, contraction, or churned (no revenue this month), in
    exact integer cents. The identity new + expansion − contraction −
    churned = net change holds row-exactly and is part of the hash
    (and asserted in tests/test_analytics_ext4.py).

    Scale shape: one monthly per-customer aggregate (map-side
    combinable), then a self full-outer join keyed on (customer,
    month+1) — an equi-join, because the lag is folded into the join
    key rather than expressed as an inequality; components are one
    grouped sum over the paired rows. Cents arithmetic keeps the
    waterfall reconciliation exact — the whole point of the report.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.date_trunc("month", F.col("o_orderdate")).alias("m"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    cur = monthly.select("cust", "m", F.col("rev_cents").alias("cur"))
    prev = monthly.select(
        "cust",
        (F.col("m") + F.expr("INTERVAL 1 MONTH")).alias("m"),
        F.col("rev_cents").alias("prev"),
    )
    paired = (
        cur.join(prev, ["cust", "m"], "full_outer")
        .select(
            "m",
            F.coalesce("cur", F.lit(0)).alias("cur"),
            F.coalesce("prev", F.lit(0)).alias("prev"),
        )
    )
    c, p = F.col("cur"), F.col("prev")
    return (
        paired.groupBy(F.col("m").cast("date").alias("month"))
        .agg(
            F.sum(F.when(p == 0, c).otherwise(0)).cast("bigint").alias("new_cents"),
            F.sum(F.when((p > 0) & (c > p), c - p).otherwise(0))
            .cast("bigint")
            .alias("expansion_cents"),
            F.sum(F.when((c > 0) & (c < p), p - c).otherwise(0))
            .cast("bigint")
            .alias("contraction_cents"),
            F.sum(F.when(c == 0, p).otherwise(0))
            .cast("bigint")
            .alias("churned_cents"),
            F.sum(c - p).cast("bigint").alias("net_change_cents"),
        )
        .orderBy(F.desc("net_change_cents"), "month")
        .limit(24)
    )
