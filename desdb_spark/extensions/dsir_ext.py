"""Round-8: DSIR data selection — hashed-ngram importance resampling
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling", public literature). The production question: given a small
high-quality TARGET domain and a huge RAW crawl, score every raw
document by how target-like its hashed n-gram distribution is, and keep
the top mass. Features are md5-hashed bigram buckets (B={N_BUCKETS});
the score is the mean log-likelihood ratio
``ln(p_target(bucket) / p_raw(bucket))`` over the document's bigram
instances, with add-1 smoothing on both bag-of-buckets models. The
fixture's target domain is ``lang = '{TARGET_LANG}'`` — a real,
non-degenerate subset (~44% of docs) whose bigrams genuinely differ by
language.

Scale shape (r9 rework — the sf1 bench showed the r8 shape 7× DuckDB):
the md5 bucket stream is computed ONCE and ``localCheckpoint``-ed raw —
both the model aggregate and the scoring join consume the materialized
stream, so the corpus-sized md5/explode pass never re-executes (the r8
shape ran it twice: once under the model aggregate, once under the
scoring join). BOTH models are one aggregate over the stream (256
bucket keys → near-perfect map-side combine; the target side is a
conditional sum); the per-bucket log-ratio table is ≤ {N_BUCKETS} rows
— broadcast back to the instance stream for the per-doc mean, the
oracle's exact grain. Model size is O(B), independent of corpus size:
exactly why DSIR hashes features. The ln() inputs are ratios of exact
integer counts (identical rationals in both engines); the 4-dp output
rounding sits far above libm's sub-ulp disagreement
(text_unigram_logprob discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Hashed feature-space size (first two md5 hex chars) and the target
#: domain the raw corpus is scored against.
N_BUCKETS = 256
TARGET_LANG = "en"


@register(
    "docs_dsir_importance_weights",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), inst AS (
            SELECT doc_id, lang,
                   substr(md5(t[i] || ' ' || t[i+1]), 1, 2) AS bucket
            FROM toks, unnest(range(1, len(t))) AS r(i)
        ), model AS (
            SELECT bucket,
                   count(*) AS c_r,
                   sum(CASE WHEN lang = '{TARGET_LANG}' THEN 1 ELSE 0 END)
                       AS c_t
            FROM inst GROUP BY bucket
        ), ratio AS (
            SELECT bucket,
                   ln(CAST((c_t + 1) * (sum(c_r) OVER () + {N_BUCKETS})
                           AS DOUBLE)
                      / CAST((c_r + 1) * (sum(c_t) OVER () + {N_BUCKETS})
                             AS DOUBLE)) AS lp
            FROM model
        )
        SELECT i.doc_id, i.lang,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(r.lp), 4) AS dsir_logratio,
               CAST(CASE WHEN round(avg(r.lp), 4) > 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS selected
        FROM inst i JOIN ratio r USING (bucket)
        GROUP BY i.doc_id, i.lang
        ORDER BY i.doc_id
    """,
    group="dsir_ext",
)
def docs_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR score against the ``{TARGET_LANG}`` target:
    bigram-instance count, mean hashed-bigram log-likelihood ratio
    (4 dp), and the keep flag (``selected = 1`` iff the rounded score is
    positive — more target-like than raw-like)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    t = F.col("t")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.substring(
            F.md5(
                F.concat_ws(
                    " ", F.element_at(t, i), F.element_at(t, i + 1)
                ).cast("binary")
            ),
            1,
            2,
        ),
    )
    # One md5/explode pass, MATERIALIZED raw: both consumers below read
    # the checkpoint instead of re-running the corpus-sized hash
    # pipeline (the md5 bucket stream is the dominant cost — profiled at
    # the 10× scale, one md5 pass alone costs 2× DuckDB's whole query,
    # i.e. Spark's per-row MessageDigest md5 vs DuckDB's vectorized md5;
    # a per-(doc,bucket) compaction shuffle before checkpointing was
    # measured SLOWER than checkpointing the raw narrow stream, because
    # ~50 distinct buckets per short doc barely compact). (Production
    # note: as elsewhere, reliable checkpoint() for multi-hour runs.)
    inst = (
        d.select("doc_id", "lang", toks.alias("t"))
        .where(F.size("t") >= 2)
        .select("doc_id", "lang", F.explode(bigrams).alias("bucket"))
        .localCheckpoint()
    )
    model = inst.groupBy("bucket").agg(
        F.count("*").alias("c_r"),
        F.sum(
            F.when(F.col("lang") == TARGET_LANG, F.lit(1)).otherwise(F.lit(0))
        ).alias("c_t"),
    )
    # Unpartitioned window over the MODEL table only (<= N_BUCKETS rows
    # post-aggregate — O(B), never corpus-sized).
    w_all = Window.partitionBy()
    ratio = model.select(
        "bucket",
        F.log(
            ((F.col("c_t") + 1) * (F.sum("c_r").over(w_all) + N_BUCKETS))
            .cast("double")
            / ((F.col("c_r") + 1) * (F.sum("c_t").over(w_all) + N_BUCKETS))
            .cast("double")
        ).alias("lp"),
    )
    score = F.round(F.avg("lp"), 4)
    return (
        inst.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            score.alias("dsir_logratio"),
            F.when(score > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("selected"),
        )
    )
