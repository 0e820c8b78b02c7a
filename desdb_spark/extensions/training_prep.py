"""Training-data preparation operators (SURVEY.md §2C pipeline tier).

The steps between a raw document corpus and a training run: deterministic
sampling, split assignment, sequence packing, and mixture weighting.
These extend the desdb surface the way its canned-query library extended
raw SQL [desdb:files.py — reconstructed, SURVEY.md §0]: common corpus
operations packaged as named, tested queries.

Determinism is the design constraint everything here hangs on: at 100 TB
a sample/split must be a PURE function of the row (re-runnable, resumable,
auditable — no rand(), no monotonically_increasing_id()). All selection
here keys off md5 of a stable identifier, which both engines produce
identically as lowercase hex; thresholds compare the hex prefix
lexicographically, so no hex→int conversion is needed anywhere. Token
counts use single-space `split`, identical in Spark and DuckDB.

Scale notes common to the module: every op is scan → narrow expressions →
one keyed shuffle (groupBy or window partition); nothing collects to the
driver, no UDFs, no Python row path. Windows partition on (source) or
(lang) — bounded-cardinality keys whose per-partition row counts stay
executor-sized at 100 TB when the corpus is source-sharded; skew on a
giant source is the documented limit and the salting helper
(operators/joins.py) is the escape hatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Sequence-packing capacity in whitespace tokens (fixture docs average
#: ~60 tokens, so packs hold ~8 docs — same regime as 2k-token packs over
#: ~250-token web documents in a real pretraining mix).
PACK_TOKENS = 512


def _doc_key_hex():
    """First two hex chars of md5(doc_id) — a stable 256-bucket hash.

    Comparing the hex PREFIX as a string avoids hex→int conversion (which
    the two engines spell differently) while keeping the full md5
    avalanche: bucket = hex prefix < threshold.
    """
    return F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)


def _tokens():
    return F.size(F.split(F.col("text"), " "))


@register(
    "sample_stratified_docs",
    oracle="""
        SELECT doc_id, lang, source
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
              < (CASE WHEN lang = 'en' THEN '40' ELSE '80' END)
    """,
    group="training_prep",
)
def sample_stratified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: downsample the majority language
    (en keeps md5 buckets < 0x40 ≈ 25%) while minority languages keep
    < 0x80 ≈ 50% — the standard rebalancing step before mixing a
    pretraining corpus.

    Scale shape: a pure narrow map + filter — no shuffle at all. The
    sample is a function of doc_id alone, so re-running on a grown
    corpus preserves every previously-sampled row (append-only
    stability, what a 100 TB incremental pipeline needs); rand()-based
    sampling has none of these properties.
    """
    d = load_table(spark, sf_dir, "documents")
    thr = F.when(F.col("lang") == "en", F.lit("40")).otherwise(F.lit("80"))
    return d.where(_doc_key_hex() < thr).select("doc_id", "lang", "source")


@register(
    "split_train_valid_test",
    oracle="""
        WITH tagged AS (
          SELECT lang,
                 CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                      THEN 'train'
                      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                      THEN 'valid'
                      ELSE 'test' END AS split,
                 len(string_split(text, ' ')) AS toks
          FROM documents)
        SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(toks) AS BIGINT) AS n_tokens
        FROM tagged GROUP BY split, lang
    """,
    group="training_prep",
)
def split_train_valid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-split assignment: md5 buckets < 0xcc (~80%) train, < 0xe6
    (~10%) valid, rest test, reported as doc/token counts per
    (split, lang).

    Scale shape: split assignment is a narrow expression (no shuffle);
    the report aggregate shuffles 15 (split × lang) partial rows per
    task. Because membership is a pure function of doc_id, train/test
    contamination cannot drift when the corpus is appended to — the
    property that matters when the split gates a 100 TB training run.
    """
    d = load_table(spark, sf_dir, "documents")
    h = _doc_key_hex()
    split = (
        F.when(h < "cc", "train").when(h < "e6", "valid").otherwise("test")
    ).alias("split")
    return (
        d.select(split, "lang", _tokens().alias("toks"))
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("toks").cast("bigint").alias("n_tokens"),
        )
    )


@register(
    "docs_pack_sequences",
    oracle="""
        WITH toks AS (
          SELECT source, doc_id, len(string_split(text, ' ')) AS toks
          FROM documents),
        packed AS (
          SELECT source, doc_id, toks,
                 CAST(floor(COALESCE(sum(toks) OVER (
                     PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   / 512.0) AS BIGINT) AS pack_id
          FROM toks)
        SELECT source, pack_id, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(toks) AS BIGINT) AS pack_tokens
        FROM packed GROUP BY source, pack_id
    """,
    group="training_prep",
)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents (in stable doc_id order,
    per source) into fixed-capacity training sequences of PACK_TOKENS
    tokens; report per-pack document count and fill.

    Pack assignment is contiguous: a doc joins the pack indexed by
    floor(prefix_sum_before / capacity) — one window pass, deterministic,
    and within 1 doc of greedy first-fit for docs ≪ capacity.

    Scale shape: one window shuffle on source (the exchange also serves
    the final groupBy — same key, Catalyst reuses it). The running sum
    is O(1) state per row. At 100 TB the per-source partition is the
    scale limit; a source-sharded corpus keeps partitions bounded, and
    packing within (source, shard) is the documented relaxation.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", "doc_id", _tokens().alias("toks"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "pack_id",
        F.floor(F.coalesce(F.sum("toks").over(w), F.lit(0)) / float(PACK_TOKENS)),
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("pack_tokens"),
    )


@register(
    "corpus_mix_weights",
    oracle="""
        WITH g AS (
          SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
                 sqrt(CAST(sum(len(string_split(text, ' '))) AS DOUBLE)) AS w
          FROM documents GROUP BY source, lang)
        SELECT source, lang, n_docs, n_tokens,
               round(w / (SELECT sum(w) FROM g), 6) AS mix_weight
        FROM g
    """,
    group="training_prep",
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture weights per (source, lang) cell: sqrt-of-token-count
    scaling (the standard temperature-style flattening, τ=2) normalized
    to sum to 1 — the sampling table a weighted training dataloader
    consumes.

    Scale shape: one groupBy shuffle over the (source × lang) key space;
    the normalizer is a SQL scalar subquery over the ALREADY-aggregated
    ~hundreds of cells (never re-reads documents), planned as a
    ``ScalarSubquery`` that inlines as a literal — no join at all (a
    constant-key equi-join constant-folds into the BNLJ the fleet plan
    audit forbids).
    """
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(_tokens()).cast("bigint").alias("n_tokens"),
    )
    g = g.withColumn("w", F.sqrt(F.col("n_tokens").cast("double")))
    g.createOrReplaceTempView("mixw_cells")
    return spark.sql(
        """
        SELECT source, lang, n_docs, n_tokens,
               round(w / (SELECT sum(w) FROM mixw_cells), 6) AS mix_weight
        FROM mixw_cells
        """
    )


@register(
    "docs_token_budget_select",
    oracle="""
        WITH ordered AS (
          SELECT lang, doc_id, len(string_split(text, ' ')) AS toks,
                 COALESCE(sum(len(string_split(text, ' '))) OVER (
                     PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
          FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_selected,
               CAST(sum(toks) AS BIGINT) AS tokens_selected
        FROM ordered
        WHERE cum_before < 2000
        GROUP BY lang
    """,
    group="training_prep",
)
def docs_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection: take documents (stable doc_id order) per
    language until a 2 000-token budget is filled — how a mixing recipe
    ('x tokens of French, y of German') is materialized from a corpus.
    A doc is taken while the budget is not yet exhausted BEFORE it, so
    the budget may overshoot by at most one document (standard
    contract; an exact cut would truncate mid-document).

    Scale shape: identical to packing — one window shuffle on lang,
    running-sum state, then a partial-agg report. The filter is on the
    window output, so no second pass over the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ordered = d.select("lang", "doc_id", _tokens().alias("toks")).withColumn(
        "cum_before", F.coalesce(F.sum("toks").over(w), F.lit(0))
    )
    return (
        ordered.where(F.col("cum_before") < 2000)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_selected"),
            F.sum("toks").cast("bigint").alias("tokens_selected"),
        )
    )
