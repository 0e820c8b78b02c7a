"""BM25 vs an independent pure-Python reference implementation."""

from __future__ import annotations

import math

from desdb_spark.extensions.retrieval_ext2 import (
    B,
    K1,
    QUERY_TERMS,
    TOP_N,
    text_bm25_search,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_bm25_matches_python_reference(spark):
    corpus = {
        r.doc_id: [t for t in r.text.split(" ") if t]
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    n_docs = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n_docs
    df = {
        q: sum(1 for toks in corpus.values() if q in toks) for q in QUERY_TERMS
    }
    scores: dict = {}
    for doc_id, toks in corpus.items():
        s, matched = 0, 0
        for q in QUERY_TERMS:
            tf = toks.count(q)
            if not tf:
                continue
            matched += 1
            idf = math.log((n_docs - df[q] + 0.5) / (df[q] + 0.5) + 1)
            c = idf * (tf * (K1 + 1)) / (tf + K1 * ((1 - B) + B * len(toks) / avgdl))
            s += int(math.floor(abs(c * 1_000_000) + 0.5)) * (1 if c >= 0 else -1)
        if matched:
            scores[doc_id] = (matched, s)
    want = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:TOP_N]
    got = [
        (r.doc_id, (r.n_terms, r.score_micros))
        for r in text_bm25_search(spark, SF_DIR).collect()
    ]
    assert got == want


def test_bm25_ranking_properties(spark):
    """Sanity invariants: scores positive for matched docs, descending
    with doc_id tie-break, and disjunctive (1 ≤ n_terms ≤ |query|)."""
    rows = text_bm25_search(spark, SF_DIR).collect()
    assert 0 < len(rows) <= TOP_N
    keys = [(-r.score_micros, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert 1 <= r.n_terms <= len(QUERY_TERMS)
        assert r.score_micros > 0
