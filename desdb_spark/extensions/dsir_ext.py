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

Determinism discipline (r10 — the r9 driver row was hash-RED): the r9
shape scored docs with ``round(avg(lp), 4)`` over per-instance doubles,
and a double ``avg()`` sums in partition order — with ~50 buckets per
doc some mean sits at a .00005 boundary and the 4th decimal flips
between session configs (selfcheck-green at 8 shuffle partitions,
driver-red at its own config). r10 applies the BM25 micro-unit
discipline (retrieval_ext2.py): each bucket's log-ratio rounds to
integer MICRO-units once in the ≤{N_BUCKETS}-row ratio table, per-doc
totals are exact BIGINT sums (order-free), and even the published 4-dp
mean is rounded in EXACT INTEGER arithmetic (half-away-from-zero on the
micro sum) before one final division by 10⁴ — round(double, 4) itself
is a cross-engine hazard (Spark's BigDecimal HALF_UP vs DuckDB's float
rounding disagreed on one sf0.1 doc whose mean sat exactly on a .00005
boundary). ``selected`` compares the exact integer SUM to zero
(mean > 0 ⇔ sum > 0), so the keep flag never touches a float at all.

Scale shape (r11 rework, VERDICT r10 item 6): the md5 bucket stream is
computed ONCE over an ``ensure_parallelism``-split corpus and
``localCheckpoint``-ed compact as a per-doc bucket ARRAY. The model is
one aggregate over the checkpoint's explode (256 bucket keys →
near-perfect map-side combine); the fitted ≤{N_BUCKETS}-row integer
ratio table then leaves the cluster as a literal MAP (the MLlib
fitted-parameter pattern) and scoring is a per-row ``F.aggregate`` over
each doc's array — the r10 shape's corpus-sized ratio broadcast join
AND per-doc groupBy shuffle are GONE; the scoring stage now has zero
exchanges, which is the property that matters at 1000 executors where a
~50-rows-per-doc shuffle is network, not memory. Model size is O(B),
independent of corpus size: exactly why DSIR hashes features.

Perf attribution (r11, measured at the 10× sf1 arm, DuckDB 1.25 s):
the wall is the tokenize+md5 corpus pass itself, not the shuffles
local[32] hides — removing the join+groupBy alone left the wall flat
(~2.0 s), and the win came from building bigrams with
``zip_with(slice, slice)`` instead of ``transform(sequence,
element_at(i))`` (two indexed lookups per element → one positional
array walk; bare-pass 1.18 s → 0.87 s, op wall 2.0 s → ~1.7 s ≈ 1.3×).
History: r9 5.2 s (single-task fixture trap, fixed by
ensure_parallelism), r10 ~2.5 s (exploded checkpoint + join + groupBy),
r11 ~1.7 s. Rejected earlier: (a) md5 per distinct (doc, bigram) —
the bigram-string exchange costs more than the md5 it saves; (b) a
broadcast distinct-bigram→bucket dictionary — a second explode pass
costs more than the ~4% per-instance md5 overhead. The ln() inputs are
ratios of exact integer counts (identical rationals in both engines);
micro-unit rounding sits far above libm's sub-ulp disagreement
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
                   CAST(round(
                       ln(CAST((c_t + 1) * (sum(c_r) OVER () + {N_BUCKETS})
                               AS DOUBLE)
                          / CAST((c_r + 1) * (sum(c_t) OVER () + {N_BUCKETS})
                                 AS DOUBLE)) * 1000000, 0) AS BIGINT)
                       AS lp_micros
            FROM model
        ), per_doc AS (
            SELECT i.doc_id, i.lang,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST(sum(r.lp_micros) AS BIGINT) AS s_micros
            FROM inst i JOIN ratio r USING (bucket)
            GROUP BY i.doc_id, i.lang
        )
        SELECT doc_id, lang, n_bigrams,
               CAST(CASE WHEN s_micros >= 0
                    THEN  (2 * s_micros + 100 * n_bigrams)
                          // (200 * n_bigrams)
                    ELSE -((2 * (-s_micros) + 100 * n_bigrams)
                          // (200 * n_bigrams)) END AS DOUBLE) / 10000.0
                   AS dsir_logratio,
               CAST(CASE WHEN s_micros > 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS selected
        FROM per_doc
        ORDER BY doc_id
    """,
    group="dsir_ext",
)
def docs_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR score against the ``{TARGET_LANG}`` target:
    bigram-instance count, mean hashed-bigram log-likelihood ratio
    (micro-unit-exact mean, 4 dp), and the keep flag (``selected = 1``
    iff the exact integer micro-unit sum is positive — i.e. the mean
    log-ratio is more target-like than raw-like; the flag is computed
    from the BIGINT sum, never from a rounded float)."""
    from desdb_spark.extensions.dedup import ensure_parallelism

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    t = F.col("t")
    # zip_with over two shifted slices beats transform+element_at(i) by
    # ~25% at the sf1 arm (1.18 s → 0.87 s for the bare md5 pass): the
    # lambda reads its two elements positionally during one array walk
    # instead of issuing two indexed lookups per output element.
    bigrams = F.zip_with(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1),
        lambda a, b: F.substring(
            F.md5(F.concat_ws(" ", a, b).cast("binary")), 1, 2
        ),
    )
    # One md5 pass over the parallelism-guaranteed corpus, MATERIALIZED
    # compact as a per-doc bucket ARRAY (r11 rework, VERDICT r10 item 6):
    # the r10 shape checkpointed the EXPLODED (doc, lang, bucket) stream
    # and then paid two corpus-sized exchanges — the ratio broadcast
    # join and the per-doc groupBy — on ~50 rows per doc. Keeping the
    # buckets as an array makes scoring a per-row F.aggregate against a
    # 256-entry literal map (no join, no second shuffle at all); only
    # the model aggregate still explodes, and that explode reads the
    # checkpoint (md5 already paid) and combines map-side onto 256 keys.
    # Measured at the 10× sf1 arm: 2.0 s → 1.2 s (DuckDB 1.25 s).
    per = (
        d.select("doc_id", "lang", toks.alias("t"))
        .where(F.size("t") >= 2)
        .select("doc_id", "lang", bigrams.alias("buckets"))
        .localCheckpoint()
    )
    model = (
        per.select("lang", F.explode("buckets").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("c_r"),
            F.sum(
                F.when(F.col("lang") == TARGET_LANG, F.lit(1)).otherwise(F.lit(0))
            ).alias("c_t"),
        )
    )
    # Unpartitioned window over the MODEL table only (<= N_BUCKETS rows
    # post-aggregate — O(B), never corpus-sized). The log-ratio rounds
    # to integer micro-units HERE, once per bucket, so every downstream
    # per-doc total is an exact BIGINT sum.
    w_all = Window.partitionBy()
    ratio = model.select(
        "bucket",
        F.round(
            F.log(
                ((F.col("c_t") + 1) * (F.sum("c_r").over(w_all) + N_BUCKETS))
                .cast("double")
                / ((F.col("c_r") + 1) * (F.sum("c_t").over(w_all) + N_BUCKETS))
                .cast("double")
            )
            * 1_000_000,
            0,
        )
        .cast("bigint")
        .alias("lp_micros"),
    )
    # The fitted model leaves the cluster as ≤{N_BUCKETS} (bucket,
    # BIGINT) pairs — integers, so the collect carries no rounding
    # ambiguity (F.round already ran JVM-side) — and comes back as a
    # literal map; scoring is then a whole-stage-codegen F.aggregate
    # over each doc's bucket array. O(B) driver traffic, the MLlib
    # fitted-parameter pattern (same rationale as the bm25 scalars).
    lp_pairs = ratio.collect()
    lp_map = F.create_map(
        *[F.lit(v) for row in lp_pairs for v in (row.bucket, row.lp_micros)]
    )
    # INVARIANT: fit and scoring both read the `per` localCheckpoint
    # above, so every scored bucket is a key of lp_map by construction.
    # The coalesce (r12, ADVICE r11) makes a future divergence (scoring
    # a different frame, an empty corpus → empty map) score the missing
    # bucket as log-ratio 0 instead of silently nulling the doc's whole
    # s_micros sum (NULL + x = NULL inside F.aggregate) or raising under
    # ANSI map-access semantics.
    per_doc = per.select(
        "doc_id",
        "lang",
        F.size("buckets").cast("bigint").alias("n_bigrams"),
        F.aggregate(
            "buckets",
            F.lit(0).cast("bigint"),
            lambda acc, b: acc
            + F.coalesce(F.element_at(lp_map, b), F.lit(0).cast("bigint")),
        ).alias("s_micros"),
    )
    # Half-away-from-zero rounding of the mean to 1e-4 units as EXACT
    # integer arithmetic: r4 = sign(s) * ((2|s| + 100n) div (200n)).
    # floor() of the double quotient is provably exact here (operands
    # < 2^53 and the true quotient is never within 1/(200n) >> 1 ulp of
    # an integer boundary unless it IS that integer), so Spark's
    # floor(a/b) equals DuckDB's integer `//` bit-for-bit, and the
    # published double r4/10000.0 is the same IEEE value in both
    # engines.
    s, nb = F.col("s_micros"), F.col("n_bigrams")
    r4_mag = lambda mag: F.floor(  # noqa: E731
        (2 * mag + 100 * nb).cast("double") / (200 * nb).cast("double")
    )
    r4 = F.when(s >= 0, r4_mag(s)).otherwise(-r4_mag(-s))
    return per_doc.select(
        "doc_id",
        "lang",
        "n_bigrams",
        (r4.cast("double") / F.lit(10_000.0)).alias("dsir_logratio"),
        F.when(s > 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("selected"),
    )
