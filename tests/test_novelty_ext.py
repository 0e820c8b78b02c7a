"""Round-8d: n-gram novelty properties — Python brute force parity at
sf0.001 plus the curve's defining shape: the first document is 100%
novel and aggregate novelty decays as the corpus saturates."""

from __future__ import annotations

from collections import defaultdict

from desdb_spark.extensions.novelty_ext import (
    NGRAM,
    text_ngram_novelty_curve,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def _brute(docs):
    first = {}
    doc_grams = {}
    for doc_id, text in sorted(docs):
        toks = [t for t in text.split(" ") if t]
        grams = {
            " ".join(toks[i : i + NGRAM])
            for i in range(len(toks) - NGRAM + 1)
        }
        doc_grams[doc_id] = grams
        for g in grams:
            first.setdefault(g, doc_id)
    return {
        doc_id: (
            len(grams),
            sum(1 for g in grams if first[g] == doc_id),
            sum(1 for g in grams if first[g] == doc_id) * 1000000 // len(grams),
        )
        for doc_id, grams in doc_grams.items()
        if grams
    }


def test_novelty_matches_python_brute_force(spark):
    docs = [
        (r.doc_id, r.text)
        for r in load_table(spark, SF_DIR, "documents").collect()
    ]
    expect = _brute(docs)
    got = {
        r.doc_id: (r.n_grams_distinct, r.n_novel, r.novelty_micros)
        for r in text_ngram_novelty_curve(spark, SF_DIR).collect()
    }
    assert got == expect


def test_curve_starts_full_and_decays(spark):
    rows = sorted(
        text_ngram_novelty_curve(spark, SF_DIR).collect(),
        key=lambda r: r.doc_id,
    )
    assert rows[0].novelty_micros == 1000000  # nothing precedes doc 0
    k = len(rows) // 4
    head = sum(r.novelty_micros for r in rows[:k]) / k
    tail = sum(r.novelty_micros for r in rows[-k:]) / k
    assert head > tail  # saturation: late arrivals add less
