"""Round-8d: truncation-recall properties — numpy recomputes the whole
curve independently at sf0.001, the full-dim anchor row must be exactly
1.0, and recall must be monotone non-decreasing in d (more prefix
dimensions never lose information about the full-dim ranking... on this
fixture's curve — asserted as measured, it is the property the curve
exists to reveal)."""

from __future__ import annotations

import numpy as np

from desdb_spark.extensions.matryoshka_ext import (
    DIMS,
    N_QUERIES,
    TOP_K,
    emb_truncation_recall_curve,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def _brute(spark):
    rows = (
        load_table(spark, SF_DIR, "embeddings").orderBy("vec_id").collect()
    )
    ids = np.array([r.vec_id for r in rows])
    M = np.array([r.embedding for r in rows], dtype=np.float64)

    def topk(d, qi):
        Md = M[:, :d]
        c = Md @ Md[qi] / (
            np.linalg.norm(Md, axis=1) * np.linalg.norm(Md[qi])
        )
        c = np.sign(c) * np.floor(np.abs(c) * 1e6 + 0.5) / 1e6
        c[ids == ids[qi]] = -2.0
        return list(ids[np.lexsort((ids, -c))[:TOP_K]])

    out = {}
    full = {qi: set(topk(DIMS[-1], qi)) for qi in range(N_QUERIES)}
    for d in DIMS:
        overlap = sum(
            len(set(topk(d, qi)) & full[qi]) for qi in range(N_QUERIES)
        )
        out[d] = overlap
    return out


def test_curve_matches_numpy(spark):
    expect = _brute(spark)
    got = {
        r.d_trunc: (r.sum_overlap, r.n_pairs, r.recall_micros)
        for r in emb_truncation_recall_curve(spark, SF_DIR).collect()
    }
    assert set(got) == set(DIMS)
    for d in DIMS:
        n = expect[d]
        assert got[d] == (
            n,
            N_QUERIES * TOP_K,
            n * 1000000 // (N_QUERIES * TOP_K),
        )


def test_full_dim_anchor_and_monotone(spark):
    rows = sorted(
        emb_truncation_recall_curve(spark, SF_DIR).collect(),
        key=lambda r: r.d_trunc,
    )
    assert rows[-1].d_trunc == DIMS[-1]
    assert rows[-1].recall_micros == 1000000
    recalls = [r.recall_micros for r in rows]
    assert recalls == sorted(recalls)
    assert recalls[0] < 1000000  # truncation must actually cost recall
