"""Round-8d: exact-substring span properties — a pure-Python brute
force recomputes the repeated windows and their merged extents at
sf0.001 and must agree exactly with the distributed op (the
differential hash proves DuckDB parity; this proves both engines
compute the semantics the docstring claims)."""

from __future__ import annotations

from collections import defaultdict

from desdb_spark.extensions.span_dedup import (
    MIN_DF,
    SPAN_K,
    dedup_exact_substring_spans,
    repeated_cross_doc,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def _brute_spans(docs):
    """(doc_id, text) -> {(doc_id, start, end, tokens, n_windows)}."""
    gram_docs = defaultdict(set)
    windows = {}
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t]
        starts = range(len(toks) - SPAN_K + 1)
        windows[doc_id] = [
            (s, " ".join(toks[s : s + SPAN_K])) for s in starts
        ]
        for _, g in windows[doc_id]:
            gram_docs[g].add(doc_id)
    repeated = {g for g, ds in gram_docs.items() if len(ds) >= MIN_DF}
    out = set()
    for doc_id, ws in windows.items():
        hits = sorted(s for s, g in ws if g in repeated)
        island = []
        for s in hits:
            if island and s <= island[-1] + SPAN_K - 1:
                island.append(s)
            else:
                if island:
                    out.add(_span(doc_id, island))
                island = [s]
        if island:
            out.add(_span(doc_id, island))
    return out


def _span(doc_id, starts):
    lo, hi = starts[0], starts[-1] + SPAN_K - 1
    return (doc_id, lo, hi, hi - lo + 1, len(starts))


def test_spans_match_python_brute_force(spark):
    docs = [
        (r.doc_id, r.text)
        for r in load_table(spark, SF_DIR, "documents").collect()
    ]
    expect = _brute_spans(docs)
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_windows)
        for r in dedup_exact_substring_spans(spark, SF_DIR).collect()
    }
    assert got == expect
    assert got, "fixture should contain repeated 5-grams"


def test_spans_disjoint_and_wide_enough(spark):
    rows = dedup_exact_substring_spans(spark, SF_DIR).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    for doc_rows in by_doc.values():
        prev_end = -1
        for r in sorted(doc_rows, key=lambda r: r.span_start):
            # maximal spans never touch: a shared/adjacent window would
            # have merged them into one island
            assert r.span_start > prev_end
            assert r.span_tokens >= SPAN_K
            assert 1 <= r.n_windows <= r.span_tokens - SPAN_K + 1
            prev_end = r.span_end


def test_two_seed_key_rescues_planted_h1_collision(spark):
    """r15 (VERDICT r14 item 5): the dedup decision runs over the
    two-seed 128-bit (h1, h2) pair via ``repeated_cross_doc``. Real
    xxhash64 collisions are not constructible, so the collision is
    PLANTED at the key level: two distinct windows in different docs
    share h1 but differ in h2 (exactly what a first-seed collision
    looks like), alongside one genuinely repeated window (both halves
    equal). The single-key decision wrongly marks the collided pair
    repeated; the pair-key decision — the function the shipping ops
    call — keeps only the true repeat. This pins the rescue property of
    the second seed on the PRODUCT function, not a test re-derivation."""
    rows = [
        # planted first-seed collision: same h1, different h2, two docs
        (1, 100, 1111),
        (2, 100, 2222),
        # true cross-doc repeat: both digest halves equal
        (3, 300, 3333),
        (4, 300, 3333),
        # singleton noise
        (5, 500, 5555),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, h1 bigint, h2 bigint")

    pair = {
        (r.doc_id, r.h1, r.h2)
        for r in repeated_cross_doc(df, ("h1", "h2")).collect()
    }
    assert pair == {(3, 300, 3333), (4, 300, 3333)}, pair

    single = {
        (r.doc_id, r.h1) for r in repeated_cross_doc(df, ("h1",)).collect()
    }
    # the weakened single key conflates the planted collision — this is
    # the false-drop class the 128-bit pair eliminates
    assert (1, 100) in single and (2, 100) in single


def test_spans_adversarial_synthetic_corpus(spark, tmp_path):
    """Semantics edges the fixture may not exercise, against the same
    brute force: (a) a window repeated twice WITHIN one doc only is not
    df >= 2 (distinct docs) and emits nothing; (b) two repeated regions
    adjacent with zero gap stay separate spans unless the bridging
    window is itself repeated; (c) a repeated bridging window merges
    them into one maximal span; (d) ragged ends shorter than SPAN_K."""
    rep = "r1 r2 r3 r4 r5"           # the cross-doc repeated 5-gram
    rep2 = "s1 s2 s3 s4 s5"          # a second repeated 5-gram
    docs = [
        # (a) within-doc repeat only: 'w1..w5' twice in doc 1, nowhere else
        (1, "w1 w2 w3 w4 w5 x1 w1 w2 w3 w4 w5"),
        # (c-pair) rep then rep2 back-to-back — doc 5 repeats this
        # exact text, so even the bridge windows are df >= 2 and the
        # two regions merge into one maximal span
        (2, f"{rep} {rep2} z1 z2"),
        # the other halves of the cross-doc repeats, far apart
        (3, f"a1 a2 {rep} b1 b2 b3"),
        (4, f"c1 {rep2} d1 d2 d3"),
        # (c) the SAME back-to-back text as doc 2 — now every bridge
        # window repeats across docs 2 and 5, merging one 10-token span
        (5, f"{rep} {rep2} y1 y2"),
        # (d) too short for any window
        (6, "t1 t2 t3"),
        # (b) rep and rep2 separated by one unrepeated token: the
        # bridge windows (containing q1) occur nowhere else, so the two
        # repeated regions stay SEPARATE spans
        (7, f"{rep} q1 {rep2}"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, t) for i, t in docs], "doc_id bigint, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_windows)
        for r in dedup_exact_substring_spans(spark, sf_dir).collect()
    }
    expect = _brute_spans(docs)
    assert got == expect
    by_doc = defaultdict(list)
    for row in got:
        by_doc[row[0]].append(row)
    assert 1 not in by_doc, "within-doc-only repeat must not be a hit"
    assert 6 not in by_doc
    # docs 2 and 5 share the full 10-token region INCLUDING bridges, so
    # each carries ONE merged span covering tokens 0..9
    for d in (2, 5):
        spans = by_doc[d]
        assert len(spans) == 1 and spans[0][1:4] == (0, 9, 10), spans
    # docs 3 and 4 carry exactly their single 5-token repeated region
    assert by_doc[3] == [(3, 2, 6, 5, 1)]
    assert by_doc[4] == [(4, 1, 5, 5, 1)]
    # doc 7: one unrepeated gap token keeps the two regions separate
    assert sorted(by_doc[7], key=lambda s: s[1]) == [
        (7, 0, 4, 5, 1),
        (7, 6, 10, 5, 1),
    ]
