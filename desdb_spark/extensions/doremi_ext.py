"""Round-9: DoReMi-style domain weight update — one multiplicative-
weights step of domain reweighting (Xie et al. 2023, "DoReMi:
Optimizing Data Mixtures Speeds Up Language Model Pretraining", public
literature). The production loop trains a proxy model and upweights
domains with high EXCESS loss; the relational core of one step is:
per-domain mean loss under a reference model, excess over the corpus
mean, and the exponentiated-gradient reweighting
``w_d ∝ exp(η · excess_d)``. The reference model here is the corpus's
own unigram LM (the same public stand-in ``text_unigram_logprob`` /
``docs_ccnet_ppl_buckets`` use — a trained proxy model's per-token NLL
table drops into the same plan), domains are ``source``.

Scale shape: one explode + vocabulary aggregate (map-side combinable;
the vocab is small relative to the corpus by definition), a broadcast
probability join, and a per-domain mean — the domain table is tiny, so
the normalization window costs nothing. ln/exp are libm
transcendentals rounded at 4 dp, far above cross-engine sub-ulp
disagreement (the hash-green text_unigram_logprob / dsir discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Exponentiated-gradient step size (DoReMi's η; 1.0 in the paper's
#: simplest form).
ETA = 1.0


@register(
    "corpus_doremi_weight_update",
    oracle=f"""
        WITH toks AS (
            SELECT source, unnest(string_split(text, ' ')) AS w
            FROM documents
        ), toks2 AS (
            SELECT source, w FROM toks WHERE w <> ''
        ), vocab AS (
            SELECT w, CAST(count(*) AS DOUBLE) AS c FROM toks2 GROUP BY w
        ), tot AS (
            SELECT sum(c) AS t FROM vocab
        ), scored AS (
            SELECT k.source, -ln(v.c / (SELECT t FROM tot)) AS nll
            FROM toks2 k JOIN vocab v ON k.w = v.w
        ), dom AS (
            SELECT source,
                   count(*) AS n_tokens,
                   avg(nll) AS mean_nll,
                   sum(nll) AS sum_nll
            FROM scored GROUP BY source
        ), base AS (
            SELECT source, n_tokens, mean_nll,
                   mean_nll - (SELECT sum(sum_nll) FROM dom)
                              / (SELECT sum(n_tokens) FROM dom) AS excess
            FROM dom
        )
        SELECT source,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               round(mean_nll, 4) AS mean_nll,
               round(excess, 4) AS excess_nll,
               round(exp({ETA} * excess)
                     / sum(exp({ETA} * excess)) OVER (), 4)
                   AS weight_after
        FROM base
        ORDER BY source
    """,
    group="doremi_ext",
)
def corpus_doremi_weight_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source: token count, mean reference NLL, excess over the
    corpus mean, and the weight after one exponentiated-gradient step
    from uniform (``w_d ∝ exp(η·excess_d)``, normalized, 4 dp) — the
    domains a DoReMi loop would upsample next round."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    vocab = toks.groupBy("w").agg(F.count("*").cast("double").alias("c"))
    total = vocab.agg(F.sum("c")).first()[0]
    probs = F.broadcast(
        vocab.select("w", (-F.log(F.col("c") / F.lit(total))).alias("nll"))
    )
    dom = (
        toks.join(probs, "w")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg("nll").alias("mean_nll"),
            F.sum("nll").alias("sum_nll"),
        )
    )
    # The domain table is tiny (O(sources)); unpartitioned windows here
    # cost nothing — corpus-sized data never reaches this stage.
    w_all = Window.partitionBy()
    excess = F.col("mean_nll") - (
        F.sum("sum_nll").over(w_all) / F.sum("n_tokens").over(w_all)
    )
    base = dom.select(
        "source", "n_tokens", "mean_nll", excess.alias("excess")
    )
    return base.select(
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round("mean_nll", 4).alias("mean_nll"),
        F.round("excess", 4).alias("excess_nll"),
        F.round(
            F.exp(F.lit(ETA) * F.col("excess"))
            / F.sum(F.exp(F.lit(ETA) * F.col("excess"))).over(w_all),
            4,
        ).alias("weight_after"),
    ).orderBy("source")
