"""Round-7 retrieval depth: BM25 ranked search — the scoring function
every production sparse retriever (Lucene/Elasticsearch, Vespa, Tantivy)
defaults to (Robertson & Zaragoza's public BM25 formulation), completing
the tf-ranked conjunctive search in extensions/retrieval_ext.py with the
idf- and length-normalized disjunctive ranking.

Determinism discipline: per-(doc, term) contributions are rounded to
integer MICRO-units and summed as exact integers, so the cross-engine
hash never depends on float summation order (the cents discipline from
[[cross-engine-float-traps]] applied to scores). The corpus scalars
(N, avgdl) are single exact-integer-sum divisions, bit-identical across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Same planted query as text_boolean_search, served disjunctively.
QUERY_TERMS = ("table", "query", "join")
K1 = 1.2
B = 0.75
TOP_N = 20


@register(
    "text_bm25_search",
    oracle=f"""
        WITH base AS (
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '),
                                   t -> t <> '')) AS dl
            FROM documents
        ), stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
            FROM base
        ), tf AS (
            SELECT d.doc_id, t.term, CAST(count(*) AS BIGINT) AS tf
            FROM documents d,
                 unnest(string_split(d.text, ' ')) AS t(term)
            WHERE t.term IN ('{QUERY_TERMS[0]}', '{QUERY_TERMS[1]}',
                             '{QUERY_TERMS[2]}')
            GROUP BY d.doc_id, t.term
        ), df AS (
            SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
        ), contrib AS (
            SELECT tf.doc_id,
                   ln((CAST(s.n_docs - df.df AS DOUBLE) + 0.5)
                      / (CAST(df.df AS DOUBLE) + 0.5) + 1)
                   * (CAST(tf.tf AS DOUBLE) * CAST({K1 + 1} AS DOUBLE))
                   / (CAST(tf.tf AS DOUBLE)
                      + CAST({K1} AS DOUBLE)
                        * (CAST({1 - B} AS DOUBLE)
                           + CAST({B} AS DOUBLE) * base.dl / s.avgdl))
                       AS c
            FROM tf
            JOIN df ON df.term = tf.term
            JOIN base ON base.doc_id = tf.doc_id
            CROSS JOIN stats s
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(CAST(round(c * 1000000, 0) AS BIGINT)) AS BIGINT)
                   AS score_micros
        FROM contrib
        GROUP BY doc_id
        ORDER BY score_micros DESC, doc_id
        LIMIT {TOP_N}
    """,
    group="retrieval_ext2",
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{TOP_N} for the planted disjunctive query: per-doc score
    Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)) with the
    Lucene-style idf = ln((N − df + ½)/(df + ½) + 1), k1=1.2, b=0.75.

    Scale shape: the IN-list predicate prunes the exploded stream to the
    query terms BEFORE any shuffle (cost ∝ the terms' collection
    frequency, not the corpus); df is a 3-row aggregate broadcast back;
    doc length is a scan-side projection joined on doc_id; N and avgdl
    are driver scalars (one tiny exact-integer action — the MLlib
    fitted-parameter pattern, never a 1-row crossJoin). Top-{TOP_N} is a
    TakeOrderedAndProject. Contributions round to integer micro-units
    before the per-doc sum, so the hash is float-order-proof.

    DuckDB note: every fractional constant is CAST to DOUBLE (k1 is
    non-dyadic — the DECIMAL-literal trap) and the oracle's CROSS JOIN
    is against a 1-row stats CTE (DuckDB-side only; the Spark plan has
    no cross join — scalars are literals).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    base = d.select("doc_id", F.size(toks).alias("dl"))
    # driver scalars: exact integer sums, one division each (bit-identical
    # to the oracle's CAST(sum AS DOUBLE)/count). Alternatives measured
    # at the 10× scale and rejected: a literal-key 1-row broadcast join
    # constant-folds into a BroadcastNestedLoopJoin (the plan audit
    # forbids the node class), and localCheckpoint pass-deduplication
    # SERIALIZES subtrees that otherwise run as concurrent stages
    # (1.4 s vs ~1.0 s) — the two-job driver-scalar shape is the fastest
    # audited plan for a sub-second op.
    tot = base.agg(
        F.count("*").alias("n"), F.sum("dl").cast("bigint").alias("s")
    ).first()
    n_docs, avgdl = tot.n, tot.s / tot.n
    # Lossless substring PREFILTER before the explode: a doc can only
    # contain the token "join" if the substring "join" appears, so
    # contains() (a scan-stage predicate, no tokenization) prunes the
    # corpus to the candidate sliver and the explode runs on that sliver
    # only — the token-exact isin() after the explode removes the
    # substring false positives ("jointly"). This is the same
    # anchor-prefilter discipline the decontamination ops use.
    any_term = None
    for qt in QUERY_TERMS:
        c = F.col("text").contains(qt)
        any_term = c if any_term is None else (any_term | c)
    tf = (
        d.where(any_term)
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    joined = tf.join(F.broadcast(df_), "term").join(base, "doc_id")
    idf = F.log(
        ((F.lit(n_docs) - F.col("df")).cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
        + 1
    )
    denom = F.col("tf").cast("double") + K1 * (
        (1 - B) + B * F.col("dl") / F.lit(avgdl)
    )
    contrib = idf * (F.col("tf").cast("double") * (K1 + 1)) / denom
    return (
        joined.select(
            "doc_id",
            F.round(contrib * 1_000_000, 0).cast("bigint").alias("c_micros"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.sum("c_micros").cast("bigint").alias("score_micros"),
        )
        .orderBy(F.desc("score_micros"), "doc_id")
        .limit(TOP_N)
    )
