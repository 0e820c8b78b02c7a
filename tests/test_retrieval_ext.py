"""Retrieval ops: index postings vs a Python inverted index, boolean
search vs set intersection, chunking coverage/overlap invariants."""

from __future__ import annotations

from desdb_spark.extensions.retrieval_ext import (
    CHUNK,
    QUERY_TERMS,
    STRIDE,
    docs_chunk_sliding,
    text_boolean_search,
    text_inverted_index,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def _corpus(spark):
    return {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF_DIR, "documents").collect()
    }


def test_inverted_index_matches_python(spark):
    corpus = _corpus(spark)
    want: dict = {}
    for doc_id, toks in corpus.items():
        for t in toks:
            if t and "q" <= t < "u":
                want.setdefault(t, {}).setdefault(doc_id, 0)
                want[t][doc_id] += 1
    rows = text_inverted_index(spark, SF_DIR).collect()
    assert {r.term for r in rows} == set(want)
    for r in rows:
        assert r.df == len(want[r.term])
        assert r.cf == sum(want[r.term].values())
        assert r.postings == ",".join(str(d) for d in sorted(want[r.term]))


def test_boolean_search_is_exact_conjunction(spark):
    corpus = _corpus(spark)
    rows = text_boolean_search(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    scores = {
        d: sum(toks.count(t) for t in QUERY_TERMS)
        for d, toks in corpus.items()
        if all(t in toks for t in QUERY_TERMS)
    }
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.doc_id, r.total_tf) for r in rows] == want


def test_chunking_covers_every_token_with_fixed_overlap(spark):
    corpus = _corpus(spark)
    by_doc: dict = {}
    for r in docs_chunk_sliding(spark, SF_DIR).collect():
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.n_tokens))
    assert set(by_doc) == set(corpus)
    for doc_id, chunks in by_doc.items():
        chunks.sort()
        n = len(corpus[doc_id])
        idxs = [i for i, _ in chunks]
        assert idxs == list(range(len(chunks)))  # contiguous indices
        # Each chunk i covers tokens [i*STRIDE+1, min(n, i*STRIDE+CHUNK)].
        for i, n_tok in chunks:
            assert n_tok == min(n, i * STRIDE + CHUNK) - (i * STRIDE + 1) + 1
        # Full coverage: last chunk must reach token n.
        last_i, last_n = chunks[-1]
        assert last_i * STRIDE + last_n == min(n, last_i * STRIDE + CHUNK) == n or (
            last_i * STRIDE + CHUNK >= n
        )
        # Overlap between consecutive full chunks is CHUNK - STRIDE.
        if len(chunks) >= 2 and n >= CHUNK + STRIDE:
            assert CHUNK - STRIDE == 16
