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
8.7× DuckDB): windows are keyed by hashes over the window's TOKEN
SLICE — no gram string is ever built and the one window shuffle carries
narrow fixed-width rows. ONE hash-keyed aggregation both decides df ≥
{MIN_DF} and carries the per-window occurrence list, so the exploded
stream is computed and shuffled exactly once (the r8 groupBy-then-
join-back shape re-executed the full gram explode for the probe side
and shuffled gram strings on both join sides). Key-collision story
(r15 — VERDICT r14 item 5 executed the documented upgrade): the window
key is now a TWO-SEED 128-BIT pair (h1, h2) — two independent
``xxhash64`` evaluations over the window's {SPAN_K} token digests (the
second with a constant discriminator prepended, i.e. a second seed),
shuffled and grouped together. This kills the channel the old
single-seed story quantified: window-grain birthday collisions, O(100)
expected at the 10¹¹-window corpus this op targets, drop to 2⁻¹²⁸ per
pair ≈ 10⁻¹⁷ expected. The residual channel is DELIBERATELY kept: both
keys read the same single 64-bit per-token digest stream, so two
distinct TOKENS whose digests collide are indistinguishable in both
seeds — expected colliding token pairs ≈ V²/2⁶⁵ ≈ 3 at a V = 10¹⁰
vocabulary, and each yields a spurious window hit only where the two
tokens also share a 4-token context. A full per-token digest-pair
chain was built and measured at the 10× arm: +25% wall (wider
explode/exchange rows, struct lead offsets) to close a vocabulary-
grain channel three orders quieter than the one this upgrade closes —
rejected; the derived-key form measures at parity with the r14
single-seed cell because the two extra costs are one codegen xxhash64
per window and one extra long on the decision exchange. The interval
merge
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
(long, int, digest-pair) rows by doc_id — narrow-row shuffle beats
per-window interpreted eval (measured at the 10× arm: 4.2 s → 2.9 s
median, same session, bit-identical output). At 100 TB both terms are linear in
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

#: Constant discriminator prepended to the second hash stream's input:
#: ``xxhash64(lit(SEED2_TAG), x)`` is an independent 64-bit hash of x
#: (PySpark's xxhash64 has a fixed internal seed, so seeding is realized
#: by extending the input tuple). Together with plain ``xxhash64(x)``
#: this forms the two-seed 128-bit key both line- and span-grain dedup
#: shuffle on.
SEED2_TAG = 1


def repeated_cross_doc(hits: "DataFrame", key_cols: tuple[str, ...]) -> "DataFrame":
    """Filter an occurrence stream to the rows whose key occurs in >= 2
    DISTINCT documents — the C4/Lee "exists elsewhere" rule, computed as
    min(doc_id) != max(doc_id) over one hash-partitioned window on
    ``key_cols`` (two primitive window aggregates, whole-stage codegen,
    no collect_list over the corpus stream and no join-back that would
    re-execute the producer for a probe side).

    ``key_cols`` is the full dedup key; callers pass BOTH halves of the
    two-seed 128-bit pair. The planted-collision test
    (tests/test_span_dedup.py) runs this very function with a
    deliberately weakened first key to prove the second seed rescues
    h1-collisions the single-seed key would conflate.
    """
    w_h = Window.partitionBy(*key_cols)
    return (
        hits.withColumn("mn", F.min("doc_id").over(w_h))
        .withColumn("mx", F.max("doc_id").over(w_h))
        .where(F.col("mn") != F.col("mx"))
    )


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
    # Window stream keyed by hashes of the window's tokens: each token is
    # hashed ONCE per document (the only HOF, one cheap lambda eval per
    # token), then the token-digest stream explodes as (doc_id, pos, v)
    # and ONE WindowExec over (doc_id ORDER BY pos) supplies the next
    # {SPAN_K - 1} digests via lead offsets — posexplode preserves
    # in-document order, the exchange it forces carries only
    # (long, int, long). The window keys are TWO whole-stage-codegen
    # multi-argument xxhash64 calls over the same {SPAN_K}-tuple, the
    # second seeded by a constant discriminator (module docstring has
    # the full collision story); no per-window interpreted lambda (the
    # r9 transform(sequence) build was CodegenFallback — 1.2 s of the
    # 3.8 s sf1 wall) and no per-window array allocation. Token-digest
    # equality ⇔ gram-text equality modulo the vocabulary-grain channel
    # documented above (tokens contain no spaces post-filter). The
    # trailing l{SPAN_K - 1}-null filter drops exactly the positions
    # with no full window.
    # r15 plan-BUILD rework (the bm25 finding generalized): every stage
    # is a selectExpr string parsed JVM-side — the Column-tree form cost
    # 0.35 s of py4j round-trips per fn() invocation (measured; now
    # 0.11 s), and the bench timer bills fn() to the cell. Executed plan
    # and output are bit-identical (verified by exact row equality at
    # the 10× arm and the unchanged differential oracle); the plan-shape
    # pins (3 exchanges, lead(), no SMJ/object-agg) hold unchanged.
    over = "OVER (PARTITION BY doc_id ORDER BY pos)"
    win = ", ".join(["v"] + [f"l{k}" for k in range(1, SPAN_K)])
    exploded = (
        d.selectExpr("doc_id", "filter(split(text, ' '), x -> x <> '') AS t")
        .where(f"size(t) >= {SPAN_K}")
        .selectExpr("doc_id", "transform(t, tok -> xxhash64(tok)) AS th")
        .selectExpr("doc_id", "posexplode(th) AS (pos, v)")
        .selectExpr(
            "doc_id", "pos", "v",
            *[f"lead(v, {k}) {over} AS l{k}" for k in range(1, SPAN_K)],
        )
        .where(f"l{SPAN_K - 1} IS NOT NULL")
        .selectExpr(
            "doc_id",
            "pos AS start",
            f"xxhash64({win}) AS h1",
            f"xxhash64({SEED2_TAG}, {win}) AS h2",
        )
    )
    # ONE shuffle decides repetition AND keeps every occurrence: at
    # MIN_DF = 2 (the Lee/C4 "exists elsewhere" rule this op and its
    # oracle fix), "≥ 2 distinct docs" ⇔ min(doc_id) ≠ max(doc_id) over
    # the window's occurrences — repeated_cross_doc above, partitioned on
    # the full 128-bit (h1, h2) pair. No collect_list (object-hash
    # aggregation over the full window stream was the r9a profile's
    # dominant cost) and no join-back (which would re-execute the
    # explode for the probe side).
    assert MIN_DF == 2, "min!=max shortcut encodes exactly df >= 2"
    hits = repeated_cross_doc(exploded, ("h1", "h2")).selectExpr(
        "doc_id",
        "CAST(start AS LONG) AS start",
        f"CAST(start + {SPAN_K - 1} AS LONG) AS e",
    )
    w_prev = (
        "OVER (PARTITION BY doc_id ORDER BY start "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    w_cum = (
        "OVER (PARTITION BY doc_id ORDER BY start "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    marked = hits.selectExpr(
        "doc_id", "start", "e",
        f"CASE WHEN start > coalesce(max(e) {w_prev}, -1) "
        "THEN 1 ELSE 0 END AS is_new",
    ).selectExpr("doc_id", "start", "e", f"sum(is_new) {w_cum} AS island")
    return (
        marked.groupBy("doc_id", "island")
        .agg(
            F.expr("CAST(min(start) AS BIGINT)").alias("span_start"),
            F.expr("CAST(max(e) AS BIGINT)").alias("span_end"),
            F.expr("CAST(max(e) - min(start) + 1 AS BIGINT)").alias("span_tokens"),
            F.expr("CAST(count(*) AS BIGINT)").alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "span_tokens", "n_windows")
        # No global sort: the differential hash is order-insensitive, and
        # Sort's range-partition sampling would re-execute the upstream
        # window/aggregate pipeline once more just to pick boundaries.
    )
