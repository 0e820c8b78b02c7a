"""Round-8e: retrieval/tokenizer telemetry — Python brute-force parity
at sf0.001 plus the defining properties: the coverage curve is
monotone and hits 100% at the closed vocabulary; collocation lift
ranks above-independence pairs first; phrase hits equal a substring
count over the reconstructed token stream."""

from __future__ import annotations

from collections import Counter

from desdb_spark.extensions.retrieval_ext3 import (
    MIN_PAIR_COUNT,
    PHRASE,
    TOP_COLLOCATIONS,
    VOCAB_SIZES,
    text_collocation_lift_topk,
    text_phrase_search_positional,
    text_vocab_coverage_curve,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def _docs(spark):
    return [
        (r.doc_id, [t for t in r.text.split(" ") if t])
        for r in load_table(spark, SF_DIR, "documents").collect()
    ]


def test_vocab_coverage_matches_brute_force(spark):
    docs = _docs(spark)
    freq = Counter(w for _, toks in docs for w in toks)
    total = sum(freq.values())
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    rows = {
        r.vocab_size: (r.covered_tokens, r.total_tokens, r.coverage_micros)
        for r in text_vocab_coverage_curve(spark, SF_DIR).collect()
    }
    assert set(rows) == set(VOCAB_SIZES)
    for v in VOCAB_SIZES:
        covered = sum(c for _, c in ranked[:v])
        assert rows[v] == (covered, total, covered * 1000000 // total)
    # Monotone, and the closed 31-word fixture vocabulary -> full cover.
    micros = [rows[v][2] for v in sorted(rows)]
    assert micros == sorted(micros)
    assert rows[max(VOCAB_SIZES)][2] == 1000000


def test_collocation_lift_matches_brute_force(spark):
    docs = _docs(spark)
    uni = Counter(w for _, toks in docs for w in toks)
    n = sum(uni.values())
    bi = Counter(
        (toks[i], toks[i + 1])
        for _, toks in docs
        for i in range(len(toks) - 1)
    )
    scored = [
        (c_ab * n * 1000000 // (uni[w1] * uni[w2]), w1, w2, c_ab)
        for (w1, w2), c_ab in bi.items()
        if c_ab >= MIN_PAIR_COUNT
    ]
    scored.sort(key=lambda x: (-x[0], x[1], x[2]))
    expect = scored[:TOP_COLLOCATIONS]
    got = text_collocation_lift_topk(spark, SF_DIR).collect()
    assert len(got) == len(expect)
    for row, (lift, w1, w2, c_ab) in zip(got, expect):
        assert (row.lift_micros, row.w1, row.w2, row.c_ab) == (
            lift,
            w1,
            w2,
            c_ab,
        )
        assert row.c_w1 == uni[w1] and row.c_w2 == uni[w2]


def test_phrase_search_matches_brute_force(spark):
    docs = _docs(spark)
    expect = {}
    for doc_id, toks in docs:
        hits = [
            i + 1
            for i in range(len(toks) - 1)
            if toks[i] == PHRASE[0] and toks[i + 1] == PHRASE[1]
        ]
        if hits:
            expect[doc_id] = (len(hits), hits[0])
    got = {
        r.doc_id: (r.n_hits, r.first_pos)
        for r in text_phrase_search_positional(spark, SF_DIR).collect()
    }
    assert got == expect
    assert expect, "fixture must contain the phrase for the test to bite"
