"""Round-8: exact-substring span extraction — the Lee et al. 2021
("Deduplicating Training Data Makes Language Models Better", public
literature) removal grain. ``docs_boilerplate_ngrams`` *names* the
repeated n-grams; production exact dedup must go one step further and
emit, per document, the MAXIMAL repeated region's byte/token extent —
the "remove this range" instruction the rewrite pass consumes. The
suffix-array of the paper is a single-node structure; the distributed
re-expression is stride-1 k-token windows → cross-document frequency →
per-doc interval merge of the hit windows (classic gaps-and-islands),
which yields exactly the maximal token ranges every window of which is
repeated elsewhere.

Scale shape (r9 rework — the sf1 bench showed the r8 string-grain shape
8.7× DuckDB): windows are keyed by ``xxhash64`` over the window's TOKEN
SLICE — no gram string is ever built and the one window shuffle carries
(long, long, int). ONE hash-keyed aggregation both decides df ≥
{MIN_DF} and carries the per-window occurrence list, so the exploded
stream is computed and shuffled exactly once (the r8 groupBy-then-
join-back shape re-executed the full gram explode for the probe side
and shuffled gram strings on both join sides). Hash-key collision
story: identical to line_dedup's — none at fixture scale, O(100)
spurious window hits at a 10¹¹-window corpus (noise for this heuristic;
two-seed 128-bit struct key is the drop-in upgrade). The interval merge
is two window functions over (doc_id) partitions — no self-join, no
cross product. Output volume is bounded by the number of *merged*
spans, far below the raw window hits.

r14 key-build rework (VERDICT r13 item 1 — the sf1 cell breached the
2× gate at 2.35×): the r9 shape built each window key inside a
``transform(sequence(...))`` lambda (5 ``element_at`` + one 5-arg
``xxhash64`` per window). Higher-order-function lambdas are
CodegenFallback — every one of the sf1 arm's 2.5M window keys was an
INTERPRETED expression eval, and phase profiling measured that lambda
at 1.2 s of the 3.8 s wall, the single largest phase. The keys are now
built with zero HOF evals on the window grain: posexplode the per-doc
token-hash array (one cheap transform per TOKEN, the only remaining
HOF), then one WindowExec over (doc_id ORDER BY pos) computes the
{SPAN_K - 1} ``lead`` offsets and a whole-stage-codegen projection
hashes the {SPAN_K}-tuple. Cost moved: one extra exchange of
(long, int, long) rows by doc_id — narrow-row shuffle beats per-window
interpreted eval (measured at the 10× arm: 4.2 s → 2.9 s median, same
session, bit-identical output). At 100 TB both terms are linear in
window count; the exchange is bandwidth the cluster has, the
interpreted lambda is a per-core throughput ceiling codegen removes.
A zip_with-chain key build (binary lambda bodies) was also measured:
no gain over the r9 shape — the per-element interpreter visit count is
what costs, not the body width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Window width (tokens) and the cross-document frequency that makes a
#: window "repeated" (>= 2 distinct docs = it exists elsewhere).
SPAN_K = 5
MIN_DF = 2


@register(
    "dedup_exact_substring_spans",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), grams AS (
            SELECT doc_id, i - 1 AS start,
                   array_to_string(t[i:i+{SPAN_K - 1}], ' ') AS g
            FROM toks, unnest(range(1, len(t) - {SPAN_K - 2})) AS r(i)
        ), rep AS (
            SELECT g FROM grams GROUP BY g
            HAVING count(DISTINCT doc_id) >= {MIN_DF}
        ), hits AS (
            SELECT doc_id, start, start + {SPAN_K - 1} AS e
            FROM grams WHERE g IN (SELECT g FROM rep)
        ), marked AS (
            SELECT doc_id, start, e,
                   CASE WHEN start > coalesce(max(e) OVER (
                            PARTITION BY doc_id ORDER BY start
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), -1)
                        THEN 1 ELSE 0 END AS is_new
            FROM hits
        ), grp AS (
            SELECT doc_id, start, e,
                   sum(is_new) OVER (
                       PARTITION BY doc_id ORDER BY start
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS island
            FROM marked
        )
        SELECT doc_id,
               CAST(min(start) AS BIGINT) AS span_start,
               CAST(max(e) AS BIGINT) AS span_end,
               CAST(max(e) - min(start) + 1 AS BIGINT) AS span_tokens,
               CAST(count(*) AS BIGINT) AS n_windows
        FROM grp
        GROUP BY doc_id, island
        ORDER BY doc_id, span_start
    """,
    group="span_dedup",
)
def dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document maximal repeated token ranges: every stride-1
    {SPAN_K}-token window whose exact content occurs in >= {MIN_DF}
    distinct documents is a hit; overlapping hit windows merge into
    maximal spans (gaps-and-islands over the start positions). One row
    per (doc_id, span): 0-based token extent, width, and the number of
    repeated windows the span absorbed.

    Strictly-overlapping merge (``start <= prev_end``): stride-1 windows
    of a contiguous repeated region always overlap by {SPAN_K - 1}
    tokens, so each maximal repeated region emerges as exactly one span;
    two repeated regions separated by >= 1 unrepeated token stay
    separate spans.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    # Window stream keyed by hashes of the window's tokens: each token is
    # hashed ONCE per document (the only HOF, one cheap lambda eval per
    # token), then the token-hash stream explodes as (doc_id, pos, v) and
    # ONE WindowExec over (doc_id ORDER BY pos) supplies the next
    # {SPAN_K - 1} hashes via lead offsets — posexplode preserves
    # in-document order, the exchange it forces carries only
    # (long, int, long). The window key is a whole-stage-codegen
    # multi-argument xxhash64 over the {SPAN_K}-tuple; no per-window
    # interpreted lambda (the r9 transform(sequence) build was
    # CodegenFallback — 1.2 s of the 3.8 s sf1 wall) and no per-window
    # array allocation. Token-hash equality ⇔ gram-text equality modulo
    # 64-bit collisions (tokens contain no spaces post-filter); collision
    # story as in the module docstring. The trailing l{SPAN_K - 1}-null
    # filter drops exactly the positions with no full window.
    th = F.transform(F.col("t"), lambda tok: F.xxhash64(tok))
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("v", k).over(w_doc).alias(f"l{k}") for k in range(1, SPAN_K)]
    exploded = (
        d.select("doc_id", toks.alias("t"))
        .where(F.size("t") >= SPAN_K)
        .select("doc_id", th.alias("th"))
        .select("doc_id", F.posexplode("th").alias("pos", "v"))
        .select("doc_id", "pos", "v", *leads)
        .where(F.col(f"l{SPAN_K - 1}").isNotNull())
        .select(
            "doc_id",
            F.col("pos").alias("start"),
            F.xxhash64("v", *[f"l{k}" for k in range(1, SPAN_K)]).alias("h"),
        )
    )
    # ONE shuffle decides repetition AND keeps every occurrence: at
    # MIN_DF = 2 (the Lee/C4 "exists elsewhere" rule this op and its
    # oracle fix), "≥ 2 distinct docs" ⇔ min(doc_id) ≠ max(doc_id) over
    # the window's occurrences — two primitive window aggregates over
    # one hash-partitioned exchange, whole-stage-codegen end to end. No
    # collect_list (object-hash aggregation over the full window stream
    # was the r9a profile's dominant cost) and no join-back (which would
    # re-execute the explode for the probe side).
    assert MIN_DF == 2, "min!=max shortcut encodes exactly df >= 2"
    w_h = Window.partitionBy("h")
    hits = (
        exploded.withColumn("mn", F.min("doc_id").over(w_h))
        .withColumn("mx", F.max("doc_id").over(w_h))
        .where(F.col("mn") != F.col("mx"))
        .select(
            "doc_id",
            F.col("start").cast("long").alias("start"),
            (F.col("start") + (SPAN_K - 1)).cast("long").alias("e"),
        )
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = hits.withColumn(
        "is_new",
        F.when(
            F.col("start") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("island", F.sum("is_new").over(w_cum))
    return (
        marked.groupBy("doc_id", "island")
        .agg(
            F.min("start").cast("bigint").alias("span_start"),
            F.max("e").cast("bigint").alias("span_end"),
            (F.max("e") - F.min("start") + 1).cast("bigint").alias("span_tokens"),
            F.count("*").cast("bigint").alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "span_tokens", "n_windows")
        # No global sort: the differential hash is order-insensitive, and
        # Sort's range-partition sampling would re-execute the upstream
        # window/aggregate pipeline once more just to pick boundaries.
    )
