"""Distributed BPE merge loop vs an independent pure-Python reference
with identical greedy left-to-right, non-overlapping merge semantics
and the same (freq desc, l, r) tie-break."""

from __future__ import annotations

from collections import Counter

from desdb_spark.extensions.bpe_train import (
    N_MERGES,
    text_bpe_train_merges,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    seqs = {w: tuple(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, syms in seqs.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        # max by (freq, then lexicographically SMALLEST pair): invert
        # the pair for the key so min-pair wins among equal freqs
        (l, r), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, freq))
        new_seqs = {}
        for w, syms in seqs.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            new_seqs[w] = tuple(out)
        seqs = new_seqs
    vocab = {s for syms in seqs.values() for s in syms}
    return merges, vocab


def test_merge_sequence_matches_reference(spark):
    rows = text_bpe_train_merges(spark, SF_DIR).collect()
    got_merges = [
        (r.left, r.right, r.pair_freq) for r in rows if r.rank >= 0
    ]
    (final,) = [r for r in rows if r.rank == -1]

    d = load_table(spark, SF_DIR, "documents")
    wf = {
        r.w: r.f
        for r in d.selectExpr("explode(split(text, ' ')) AS w")
        .where("w <> ''")
        .groupBy("w")
        .count()
        .withColumnRenamed("count", "f")
        .collect()
    }
    ref_merges, ref_vocab = _reference_bpe(wf, N_MERGES)
    assert got_merges == ref_merges  # exact pair, order, and frequency
    assert final.pair_freq == len(ref_vocab)
    # merges actually compress: each chosen pair had positive weight
    assert all(f > 0 for _, _, f in got_merges)
    assert len(got_merges) == N_MERGES


def test_apply_stats_match_reference(spark):
    from desdb_spark.extensions.bpe_train import text_bpe_apply_stats

    (r,) = text_bpe_apply_stats(spark, SF_DIR).collect()
    d = load_table(spark, SF_DIR, "documents")
    wf = {
        row.w: row.f
        for row in d.selectExpr("explode(split(text, ' ')) AS w")
        .where("w <> ''")
        .groupBy("w")
        .count()
        .withColumnRenamed("count", "f")
        .collect()
    }
    ref_merges, _ = _reference_bpe(wf, N_MERGES)
    # apply reference merges per word, weight by freq
    before = sum(len(w) * f for w, f in wf.items())
    seqs = {w: list(w) for w in wf}
    for l, rgt, _f in ref_merges:
        for w, syms in seqs.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == rgt:
                    out[-1] = l + rgt
                else:
                    out.append(s)
            seqs[w] = out
    after = sum(len(seqs[w]) * f for w, f in wf.items())
    assert (r.symbols_before, r.tokens_after) == (before, after)
    assert r.compression_micros == (1_000_000 * after) // before
    assert r.n_merges == N_MERGES
    assert after < before  # merges actually compressed the corpus
