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
