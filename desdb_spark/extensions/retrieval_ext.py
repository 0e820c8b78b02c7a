"""Round-6 batch-8 retrieval infrastructure: inverted index, boolean
search, sliding-window chunking.

The retrieval side of a training/eval corpus: build the
term → postings structure (the data layout behind every sparse search
engine — Zobel & Moffat's survey, public literature), query it with a
conjunctive term search, and segment documents into overlapping
fixed-size chunks (the RAG/embedding-window prep step). All three are
pure relational shapes — explode/groupBy/having — so they hash-check
against DuckDB and inherit Catalyst's pushdown wholesale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Conjunctive query for text_boolean_search (terms known to co-occur in
#: the fixture vocabulary).
QUERY_TERMS = ("table", "query", "join")

#: Chunking geometry for docs_chunk_sliding: window of CHUNK tokens,
#: advancing STRIDE tokens (CHUNK - STRIDE tokens of overlap).
CHUNK = 64
STRIDE = 48


@register(
    "text_inverted_index",
    oracle="""
        WITH tf AS (
            SELECT t.term, d.doc_id, CAST(count(*) AS BIGINT) AS tf
            FROM documents d,
                 unnest(string_split(d.text, ' ')) AS t(term)
            WHERE t.term <> ''
            GROUP BY t.term, d.doc_id
        )
        SELECT term,
               CAST(count(*) AS BIGINT) AS df,
               CAST(sum(tf) AS BIGINT) AS cf,
               array_to_string(list_sort(list(doc_id)), ',') AS postings
        FROM tf
        WHERE term >= 'q' AND term < 'u'
        GROUP BY term
    """,
    group="retrieval_ext",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the corpus (restricted to terms in [q, u) so
    the postings arrays stay hashable-size in the report): per term, the
    document frequency, collection frequency, and the SORTED posting
    list of doc_ids — the structure a sparse retrieval engine serves
    from. The posting list is string-encoded (comma-joined) because
    hash-checked operators must emit only scalar top-level columns: the
    external driver canonicalizes with pandas ``sort_values``, which
    raises on array cells (VERDICT r6 item 2).

    Scale shape: explode → (term, doc) partial counts (map-side
    combine absorbs within-doc repetition before the shuffle) → per-term
    aggregation whose ``sort_array(collect_list(...))`` materializes one
    posting list per reducer key. At 100 TB the posting lists ARE the
    data product: they'd be written range-partitioned by term
    (sink_sorted_parquet's layout) rather than returned; per-term skew
    (stopwords) is why real deployments stop the list at a df cap and
    spill the tail to blocked postings — the term-range predicate here
    plays that role and is pushed into the aggregate's input.
    """
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    return (
        tf.where((F.col("term") >= "q") & (F.col("term") < "u"))
        .groupBy("term")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            F.sum("tf").cast("bigint").alias("cf"),
            F.array_join(
                F.sort_array(F.collect_list("doc_id")).cast("array<string>"), ","
            ).alias("postings"),
        )
    )


@register(
    "text_boolean_search",
    oracle=f"""
        WITH hits AS (
            SELECT d.doc_id, t.term,
                   CAST(count(*) AS BIGINT) AS tf
            FROM documents d,
                 unnest(string_split(d.text, ' ')) AS t(term)
            WHERE t.term IN ('{QUERY_TERMS[0]}', '{QUERY_TERMS[1]}',
                             '{QUERY_TERMS[2]}')
            GROUP BY d.doc_id, t.term
        )
        SELECT doc_id,
               CAST(sum(tf) AS BIGINT) AS total_tf
        FROM hits
        GROUP BY doc_id
        HAVING count(*) = {len(QUERY_TERMS)}
        ORDER BY total_tf DESC, doc_id
        LIMIT 20
    """,
    group="retrieval_ext",
)
def text_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) search: the top-20 documents containing ALL of
    {QUERY_TERMS}, ranked by summed term frequency with a doc_id
    tie-break. This is posting-list intersection expressed relationally:
    count distinct matched terms per doc, keep docs matching the full
    conjunction.

    Scale shape: the IN-list predicate prunes the exploded stream to
    query terms only BEFORE any shuffle (so the cost is proportional to
    the query terms' collection frequency, not the corpus); the
    intersection is one groupBy-having on doc_id; top-20 is a
    TakeOrderedAndProject. Exactly how a relational engine evaluates
    sparse search without a dedicated index — and the plan an index
    (text_inverted_index) would shortcut.
    """
    d = load_table(spark, sf_dir, "documents")
    hits = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("total_tf"),
            F.count("*").alias("n_terms"),
        )
        .where(F.col("n_terms") == len(QUERY_TERMS))
        .drop("n_terms")
        .orderBy(F.desc("total_tf"), "doc_id")
        .limit(20)
    )


@register(
    "docs_chunk_sliding",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS tokens
            FROM documents
        ), chunks AS (
            SELECT doc_id,
                   CAST(s AS BIGINT) AS chunk_idx,
                   1 + s * {STRIDE} AS start_tok,
                   least(len(tokens), s * {STRIDE} + {CHUNK}) AS end_tok
            FROM toks,
                 unnest(generate_series(
                     0, CAST(greatest(
                         ceil((len(tokens) - {CHUNK}) / {STRIDE}.0),
                         0) AS BIGINT))) AS g(s)
        )
        SELECT doc_id, chunk_idx,
               CAST(end_tok - start_tok + 1 AS BIGINT) AS n_tokens
        FROM chunks
    """,
    group="retrieval_ext",
)
def docs_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: split every document into {CHUNK}-token
    windows advancing {STRIDE} tokens (16-token overlap), the
    segmentation an embedding/RAG pipeline feeds to its encoder. Emits
    (doc_id, chunk_idx, n_tokens); the final short window is kept (a
    trailing remainder shorter than the stride folds into the last
    chunk's count), and every token is covered — both properties pinned
    in tests/test_retrieval_ext.py.

    Scale shape: chunk enumeration is a ``sequence``-explode per doc —
    narrow, no shuffle, output rows ∝ tokens/STRIDE. The chunk TEXT
    itself would be ``slice(tokens, start, n)`` in the same projection;
    this op emits the geometry so the hashed result stays compact while
    the slicing expression is exercised in the pytest.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("tokens"))
    n = F.size("tokens")
    last_idx = F.greatest(
        F.ceil((n - F.lit(CHUNK)) / F.lit(float(STRIDE))), F.lit(0)
    ).cast("bigint")
    chunks = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("bigint"), last_idx)).alias("chunk_idx"),
        n.alias("n_total"),
    )
    start = chunks.chunk_idx * STRIDE + 1
    end = F.least(F.col("n_total"), chunks.chunk_idx * STRIDE + CHUNK)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        (end - start + 1).cast("bigint").alias("n_tokens"),
    )
