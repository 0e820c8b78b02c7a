"""Round-8e: k-anonymity audit and SemDeDup retention sweep — Python
brute-force parity at sf0.001 plus the defining shapes: band masses
partition the corpus exactly; removal counts are monotone
non-increasing in the threshold and the planted-twin knee is visible."""

from __future__ import annotations

from collections import Counter

from desdb_spark.extensions.dedup_semantic import (
    SEM_THRESHOLD,
    dedup_semantic_embedding,
)
from desdb_spark.extensions.privacy_ext import (
    LEN_BUCKET,
    docs_k_anonymity_audit,
)
from desdb_spark.extensions.semdedup_curve import (
    THRESHOLDS_MICROS,
    dedup_semantic_retention_curve,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_k_anonymity_matches_brute_force(spark):
    docs = load_table(spark, SF_DIR, "documents").collect()
    classes = Counter(
        (r.lang, r.source, r.n_chars // LEN_BUCKET) for r in docs
    )

    def band_lo(c):
        return 1 if c == 1 else 2 if c <= 4 else 5 if c <= 9 else 10 if c <= 49 else 50

    bands = Counter()
    mass = Counter()
    for c in classes.values():
        bands[band_lo(c)] += 1
        mass[band_lo(c)] += c
    total = sum(mass.values())
    got = docs_k_anonymity_audit(spark, SF_DIR).collect()
    assert {r.band_lo for r in got} == set(bands)
    for r in got:
        assert r.n_classes == bands[r.band_lo]
        assert r.n_docs == mass[r.band_lo]
        assert r.docs_share_micros == mass[r.band_lo] * 1000000 // total
    # band masses partition the corpus exactly
    assert sum(r.n_docs for r in got) == len(docs)
    assert total == len(docs)


def test_retention_curve_monotone_with_twin_knee(spark):
    rows = sorted(
        dedup_semantic_retention_curve(spark, SF_DIR).collect(),
        key=lambda r: r.threshold_micros,
    )
    assert [r.threshold_micros for r in rows] == sorted(THRESHOLDS_MICROS)
    removed = [r.n_removed for r in rows]
    # raising the threshold never removes more
    assert removed == sorted(removed, reverse=True)
    for r in rows:
        assert (
            r.retention_micros
            == (r.n_total - r.n_removed) * 1000000 // r.n_total
        )
    # the planted twins survive every threshold below their ~0.9995
    # cosine: the 999000-micros point still removes all of them
    e = load_table(spark, SF_DIR, "embeddings")
    n_twins = e.where("vec_id % 10 = 0").count()
    at_999 = next(r for r in rows if r.threshold_micros == 999_000)
    assert at_999.n_removed >= n_twins > 0


def test_curve_consistent_with_decision_list(spark):
    """The sweep and the decision list consume the same pair grain: the
    curve point nearest SEM_THRESHOLD from below must remove at least
    as many vectors as the decision list emits, and the 999800 point
    (above the threshold) at most the decision-list count."""
    decisions = dedup_semantic_embedding(spark, SF_DIR).count()
    rows = {
        r.threshold_micros: r.n_removed
        for r in dedup_semantic_retention_curve(spark, SF_DIR).collect()
    }
    thr_micros = int(SEM_THRESHOLD * 1_000_000)  # 998000
    below = max(t for t in rows if t <= thr_micros)
    above = min(t for t in rows if t > thr_micros)
    assert rows[below] >= decisions >= rows[above] - 0
