"""Round-8: global line-grain dedup with document reassembly — the C4
cleaning rule (Raffel et al. 2020, public literature): any line/span
whose exact content occurs in MORE THAN ONE document in the corpus is
boilerplate and is removed from every document, and the surviving lines
are re-joined into the cleaned text. This sits between
``docs_boilerplate_ngrams`` (which only *names* repeated grams) and
``dedup_exact_substring_spans`` (which emits per-doc extents): it
produces the actual rewritten-document summary the training pipeline
ships.

The fixture's text carries no newlines, so "lines" are fixed
{LINE_W}-token windows (stride {LINE_W}, last line ragged) — the
documented stand-in; with real newline-delimited text only the
line-splitter expression changes, the relational shape is identical.

Scale shape (r9 rework — the sf1 bench showed the r8 shape 7.5× DuckDB,
not floor-bound): NO line text ever crosses an exchange. Lines explode
once as (doc_id, line_id, two-seed 128-bit digest pair of the
token-slice) — the key is content-exact modulo a SIMULTANEOUS double
64-bit collision (2⁻¹²⁸ per pair; the oracle groups by the raw line
text, so parity PROVES the hash keying changes nothing on real data).
ONE hash-partitioned exchange both decides repetition
(min ≠ max doc over the key's occurrences — codegen window aggregates,
no object-hash collect over the corpus stream, no join-back) and
forwards the dropped occurrences; reassembly is a per-doc codegen
rebuild — the kept text is re-derived from the original token array by
filtering out the dropped line_ids, so the only doc-grain join payload
is (doc_id, drop_ids int array), broadcast-size in practice and
int-array-size always. Two corpus-grain exchanges total (line hashes,
dropped int pairs), versus the r8 shape's three full re-explodes of the
corpus plus two full-text exchanges (line-keyed join + collect_list
reassembly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.extensions.span_dedup import SEED2_TAG, repeated_cross_doc
from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Tokens per pseudo-line; a line is dropped when its exact content
#: appears in >= MIN_DROP_DF distinct documents (C4: "more than once").
LINE_W = 8
MIN_DROP_DF = 2


@register(
    "docs_dedup_lines_global",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), lines AS (
            SELECT doc_id, i AS line_id,
                   array_to_string(
                       t[i*{LINE_W}+1 : i*{LINE_W}+{LINE_W}], ' ') AS lt
            FROM toks, unnest(range(0, (len(t)+{LINE_W - 1})//{LINE_W})) AS r(i)
        ), freq AS (
            SELECT lt, count(DISTINCT doc_id) AS df FROM lines GROUP BY lt
        ), kept AS (
            SELECT l.doc_id, l.line_id, l.lt
            FROM lines l JOIN freq f USING (lt)
            WHERE f.df < {MIN_DROP_DF}
        ), re AS (
            SELECT doc_id, count(*) AS n_kept,
                   string_agg(lt, ' ' ORDER BY line_id) AS kept_text
            FROM kept GROUP BY doc_id
        ), totals AS (
            SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(t.n_lines AS BIGINT) AS n_lines,
               CAST(coalesce(re.n_kept, 0) AS BIGINT) AS n_kept,
               CAST(length(coalesce(re.kept_text, '')) AS BIGINT)
                   AS kept_n_chars,
               md5(coalesce(re.kept_text, '')) AS kept_md5
        FROM totals t LEFT JOIN re USING (doc_id)
        ORDER BY t.doc_id
    """,
    group="line_dedup",
)
def docs_dedup_lines_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rewrite summary after global line dedup: total
    pseudo-lines, lines kept (those whose exact content is unique to one
    document), the rewritten text's length, and its md5 digest — the
    digest makes the whole reassembled text part of the hashed contract
    without shipping it.
    """
    from desdb_spark.extensions.dedup import ensure_parallelism

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    # r15 plan-BUILD rework (the bm25 finding generalized): every stage
    # is a selectExpr string parsed JVM-side. The Column-tree form cost
    # ~0.28 s of py4j round-trips per fn() invocation building the HOF
    # lambdas and the reassembly tree, and the bench timer bills fn() to
    # the cell; executed plan and output are bit-identical (verified by
    # exact row equality at the 10× arm and the unchanged differential
    # oracle). The remaining fn()-time term is the lazy checkpoint's
    # toRdd, which under AQE materializes the ensure_parallelism
    # exchange (i.e. real tokenize work, not driver fat).
    # Tokenize ONCE and materialize (r10 — VERDICT r9 item 4): the token
    # arrays feed BOTH the line-hash stream and the per-doc reassembly,
    # and without the checkpoint each consumer re-runs scan+split over
    # the corpus (the residual 3.0×-of-baseline at the 10× arm was two
    # corpus-sized tokenize passes, one of them planned as a single
    # task on the one-row-group fixture — the dedup.py single-split
    # trap, hence ensure_parallelism above).
    # eager=False (r14 — VERDICT r13 item 4): the eager default runs the
    # materialization as its own action BEFORE the consuming action,
    # paying one extra job-floor + a cold write barrier per call; lazy
    # folds it into the first consuming action (both consumers below
    # share the one materialization inside that action). Measured at the
    # 10× arm: 1.71 s → 1.47 s median — back under 1.5× of the frozen
    # DuckDB cell. A persist(MEMORY_ONLY) variant measured the same
    # within noise; checkpoint keeps the truncated-lineage contract.
    base = (
        d.selectExpr("doc_id", "filter(split(text, ' '), x -> x <> '') AS t")
        .where("size(t) > 0")
        .localCheckpoint(eager=False)
    )
    # Hash-grain line stream: the ONLY exploded representation. The key
    # is the TWO-SEED 128-BIT digest pair over the line's TOKEN SLICE
    # (r15 — VERDICT r14 item 5; second seed = constant discriminator
    # prepended to the hash input, see span_dedup.SEED2_TAG) — no line
    # string is ever built on this side (tokens contain no spaces
    # post-filter, so token-array equality ⇔ joined-line-text equality),
    # and the shuffle carries (long, int, long, long).
    # Decision-key collisions: a false boilerplate drop needs BOTH
    # 64-bit digests to collide at once — ~10⁻¹⁷ expected at a 10¹¹-line
    # corpus (vs O(100) under the retired single-seed key) — and the key
    # is full-content 128-bit with no vocabulary-grain residual.
    # r16 shape (VERDICT r15 item 2 — recover the +0.26 s the r15 key
    # upgrade cost): explode the line ids FIRST and compute both digests
    # in a plain codegen projection, instead of building a
    # struct<long,long> array inside a transform() lambda and
    # posexploding it. The lambda body was INTERPRETED — no codegen, no
    # subexpression elimination — so the slice was evaluated twice per
    # line and each xxhash64 walked it through the HOF evaluator; as
    # top-level projection expressions the two hashes run inside
    # whole-stage codegen with subexpression elimination sharing the ONE
    # slice, and the per-doc struct-array allocation disappears. The
    # generate's `t` column never materializes per line row (codegen
    # pipelines explode → project in one stage). Measured at the 10× arm
    # interleaved median-of-6: 1.47 → 1.27 s (~1.24× the frozen DuckDB
    # cell, back inside the ≤1.25× target; the retired r15 shape sat at
    # 1.40-1.49×). The r15-rejected alternatives stay rejected:
    # per-token digest stream 1.65 s, nested-transform slice binding
    # 1.60 s. The oracle groups by the raw line text, so the
    # differential hash PROVES the hash keying changes nothing.
    lines_h = (
        base.selectExpr(
            "doc_id",
            "t",
            f"explode(sequence(0, CAST(ceil(size(t) / {LINE_W}) AS INT) - 1))"
            " AS line_id",
        )
        .selectExpr(
            "doc_id",
            "line_id",
            f"slice(t, line_id * {LINE_W} + 1, {LINE_W}) AS ls",
        )
        .selectExpr(
            "doc_id",
            "line_id",
            "xxhash64(ls) AS ha",
            f"xxhash64({SEED2_TAG}, ls) AS hb",
        )
    )
    # ONE hash-partitioned exchange decides repetition AND keeps every
    # occurrence: at MIN_DROP_DF = 2 (the C4 "occurs in more than one
    # document" rule this op and its oracle fix), "≥ 2 distinct docs" ⇔
    # min(doc_id) ≠ max(doc_id) over the line's occurrences —
    # repeated_cross_doc (shared with span_dedup), partitioned on both
    # digest halves: no collect_list object aggregation over the
    # corpus-sized stream and no join-back (which would re-execute the
    # explode for the probe side; the span_dedup rework proved this
    # shape at the 10× scale). Only the small BOILERPLATE side reaches
    # the per-doc collect_set below.
    assert MIN_DROP_DF == 2, "min!=max shortcut encodes exactly df >= 2"
    dropped = (
        repeated_cross_doc(lines_h, ("ha", "hb"))
        .groupBy("doc_id")
        .agg(F.collect_set("line_id").alias("drop_ids"))
    )
    # Codegen reassembly: re-derive kept lines from the token array,
    # skipping dropped line_ids — no text ever shuffled, and totals come
    # free from the array length (no second aggregation over lines).
    # Docs with no dropped lines (the overwhelming majority — C4 drops
    # boilerplate, not corpora) take the cheap whole-text path; only
    # docs that actually lost a line pay the per-line rebuild. Both
    # branches produce the identical single-space-joined string. The
    # dids/nl binding stage keeps the coalesced array and line count
    # single-reference for the consumers below; the rebuilt text gets
    # its own projection so length() and md5() share ONE rebuild. Return
    # WITHOUT a global sort: the driver's differential hash is
    # order-insensitive, and Sort's range-partition sampling would
    # execute this (deliberately compute-heavy, shuffle-free) rebuild
    # stage a second time just to pick boundaries — measured 2.5 s of
    # pure re-execution at the 10× scale.
    return (
        base.join(dropped, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "t",
            "coalesce(drop_ids, CAST(array() AS ARRAY<INT>)) AS dids",
            f"CAST(ceil(size(t) / {LINE_W}) AS INT) AS nl",
        )
        .selectExpr(
            "doc_id",
            "CAST(nl AS BIGINT) AS n_lines",
            "CAST(nl - size(dids) AS BIGINT) AS n_kept",
            "CASE WHEN size(dids) = 0 THEN concat_ws(' ', t) "
            "ELSE concat_ws(' ', transform("
            "filter(sequence(0, nl - 1), i -> NOT array_contains(dids, i)), "
            f"i -> concat_ws(' ', slice(t, i * {LINE_W} + 1, {LINE_W})))) "
            "END AS kt",
        )
        .selectExpr(
            "doc_id",
            "n_lines",
            "n_kept",
            "CAST(length(kt) AS BIGINT) AS kept_n_chars",
            "md5(kt) AS kept_md5",
        )
    )
