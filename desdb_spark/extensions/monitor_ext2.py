"""Round-6 batch-14 monitoring and LM-based quality depth.

- CUSUM changepoint detection (Page 1954, public literature): the
  cumulative sum of deviations from the series mean peaks at the point
  where the level shifts — the standard "when did the metric change"
  detector next to the existing trailing-z-score anomaly op
  (extensions/stats_monitor.py), which answers "which points are
  weird" instead.
- Unigram language-model scoring (the CCNet-style filter — Wenzek et
  al. 2020, public literature): score each document by the mean log
  probability of its tokens under the corpus's own unigram
  distribution; junk scores low, boilerplate scores suspiciously
  high. The real pipelines swap in a 5-gram KenLM; the Spark shape
  (token explode → broadcast-joined probabilities → per-doc mean) is
  identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "stat_cusum_changepoint",
    oracle="""
        WITH daily AS (
            SELECT o_orderdate AS d, sum(o_totalprice) AS rev
            FROM orders GROUP BY o_orderdate
        ), stats AS (
            SELECT avg(rev) AS mu FROM daily
        ), cusum AS (
            SELECT d, rev,
                   sum(rev - (SELECT mu FROM stats)) OVER (ORDER BY d) AS s
            FROM daily
        )
        SELECT d, round(rev, 2) AS rev, round(s, 2) AS cusum,
               round(abs(s), 2) AS abs_cusum
        FROM cusum
        ORDER BY abs(s) DESC, d LIMIT 10
    """,
    group="monitor_ext2",
)
def stat_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over daily order revenue: cumulative sum
    of deviations from the global mean, reporting the 10 days where
    |CUSUM| peaks — the argmax is the maximum-likelihood single
    changepoint of a mean-shift model.

    Scale shape: daily aggregate (map-side combinable), the global mean
    as a driver scalar folded in as a literal (two engines compute it
    from identical daily sums; the 2-dp rounding dwarfs their ulp
    drift), one ordered window over the calendar-sized series, top-10
    by TakeOrderedAndProject.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    ).localCheckpoint(eager=True)
    mu = daily.agg(F.avg("rev")).first()[0]
    s = F.sum(F.col("rev") - F.lit(mu)).over(W.orderBy("d"))
    return (
        daily.select(
            "d",
            F.round("rev", 2).alias("rev"),
            F.round(s, 2).alias("cusum"),
            F.round(F.abs(s), 2).alias("abs_cusum"),
        )
        .orderBy(F.desc("abs_cusum"), "d")
        .limit(10)
    )


@register(
    "text_unigram_logprob",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents
        ), toks2 AS (
            SELECT doc_id, w FROM toks WHERE w <> ''
        ), vocab AS (
            SELECT w, CAST(count(*) AS DOUBLE) AS c FROM toks2 GROUP BY w
        ), tot AS (
            SELECT sum(c) AS t FROM vocab
        ), scored AS (
            SELECT k.doc_id, ln(v.c / (SELECT t FROM tot)) AS lp
            FROM toks2 k JOIN vocab v ON k.w = v.w
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               round(avg(lp), 4) AS mean_logprob,
               round(exp(-avg(lp)), 2) AS perplexity
        FROM scored GROUP BY doc_id
        ORDER BY mean_logprob, doc_id LIMIT 40
    """,
    group="monitor_ext2",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 40 least-probable documents under the corpus's own unigram
    LM: per doc, token count, mean token log-probability, and unigram
    perplexity — the CCNet-style quality signal (low = off-distribution
    junk; in production the unigram table is a trained n-gram model,
    same plan).

    Scale shape: one explode + vocab count (map-side combinable over
    the vocabulary key space), the total as part of a broadcast-joined
    probability table (vocab is small relative to the corpus — the
    defining property of a vocabulary), one per-doc mean. ln/exp are
    libm transcendentals rounded at 4/2 dp, orders of magnitude above
    the engines' sub-ulp disagreement.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w") != ""
    )
    vocab = toks.groupBy("w").agg(F.count("*").cast("double").alias("c"))
    total = vocab.agg(F.sum("c")).first()[0]
    probs = F.broadcast(
        vocab.select("w", F.log(F.col("c") / F.lit(total)).alias("lp"))
    )
    return (
        toks.join(probs, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.avg("lp"), 4).alias("mean_logprob"),
            F.round(F.exp(-F.avg("lp")), 2).alias("perplexity"),
        )
        .orderBy("mean_logprob", "doc_id")
        .limit(40)
    )
