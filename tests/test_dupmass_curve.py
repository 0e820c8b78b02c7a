"""Round-8e: duplicate-mass curve — Python brute-force parity at
sf0.001 plus the curve's defining shape: duplicate share is
non-increasing in n (longer grams repeat no more often than their
prefixes) and unigram dup mass dominates."""

from __future__ import annotations

from collections import Counter

from desdb_spark.extensions.dupmass_curve import (
    MAX_N,
    corpus_dup_mass_by_ngram_len,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_dup_mass_matches_brute_force(spark):
    docs = [
        [t for t in r.text.split(" ") if t]
        for r in load_table(spark, SF_DIR, "documents").collect()
    ]
    got = {
        r.n: (r.instances, r.distinct_grams, r.dup_instances, r.dup_share_micros)
        for r in corpus_dup_mass_by_ngram_len(spark, SF_DIR).collect()
    }
    assert set(got) == set(range(1, MAX_N + 1))
    for n in range(1, MAX_N + 1):
        c = Counter(
            " ".join(toks[i : i + n])
            for toks in docs
            for i in range(len(toks) - n + 1)
        )
        inst, dist = sum(c.values()), len(c)
        assert got[n] == (
            inst,
            dist,
            inst - dist,
            (inst - dist) * 1000000 // inst,
        )


def test_dup_share_monotone_decreasing_in_n(spark):
    rows = sorted(
        corpus_dup_mass_by_ngram_len(spark, SF_DIR).collect(),
        key=lambda r: r.n,
    )
    shares = [r.dup_share_micros for r in rows]
    assert shares == sorted(shares, reverse=True)
    assert shares[0] > 900_000  # 31-word vocabulary: unigrams ~all dup
