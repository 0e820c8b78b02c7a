"""Round-8d: binary-quantized ANN properties — numpy recomputes the
sign-bit packing, the Hamming prefilter, and the exact rerank, and the
distributed op must agree exactly; plus the recall-vs-exact floor the
two-tier contract promises (the differential hash proves DuckDB parity;
these prove the semantics)."""

from __future__ import annotations

import numpy as np

from desdb_spark.extensions.ann_binary import (
    CAND_C,
    N_QUERIES,
    TOP_K,
    ann_binary_hamming_rerank,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def _load(spark):
    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    M = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, M


def _brute(ids, M):
    sigs = (M > 0).astype(np.int64)
    out = []
    for qi in range(N_QUERIES):
        ham = (sigs ^ sigs[qi]).sum(axis=1)
        order = np.lexsort((ids, ham))
        cand = [j for j in order if ids[j] != ids[qi]][:CAND_C]
        cos = M[cand] @ M[qi] / (
            np.linalg.norm(M[cand], axis=1) * np.linalg.norm(M[qi])
        )
        cos = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6
        rk = np.lexsort((ids[cand], -cos))[:TOP_K]
        for j in rk:
            out.append(
                (ids[qi], ids[cand[j]], int(ham[cand[j]]), float(cos[j]))
            )
    return set(out)


def test_two_tier_pipeline_matches_numpy(spark):
    ids, M = _load(spark)
    expect = _brute(ids, M)
    got = {
        (r.query_id, r.vec_id, r.hamming, float(r.cos_sim))
        for r in ann_binary_hamming_rerank(spark, SF_DIR).collect()
    }
    assert got == expect
    assert len(got) == N_QUERIES * TOP_K


def test_recall_vs_exact_topk_beats_candidate_ratio(spark):
    """The Hamming tier keeps CAND_C of ~500 vectors (an ~8% candidate
    ratio at this SF), so a random prefilter would land recall@{TOP_K}
    ≈ 0.08. 64-bit sign codes correlate with cosine (measured
    corr ≈ −0.65 on the fixture), lifting recall to ≈ 0.56 — assert the
    tier's real claim: recall ≥ 0.4 absolute and ≥ 5× the candidate
    ratio (the rerank makes precision exact; recall is the knob CAND_C
    buys)."""
    ids, M = _load(spark)
    got = ann_binary_hamming_rerank(spark, SF_DIR).collect()
    hits = total = 0
    for qi in range(N_QUERIES):
        cos = M @ M[qi] / (np.linalg.norm(M, axis=1) * np.linalg.norm(M[qi]))
        cos[ids == ids[qi]] = -2.0
        exact = set(ids[np.lexsort((ids, -cos))[:TOP_K]])
        approx = {r.vec_id for r in got if r.query_id == ids[qi]}
        hits += len(exact & approx)
        total += TOP_K
    recall = hits / total
    cand_ratio = CAND_C / len(ids)
    assert recall >= 0.4
    assert recall >= 5 * cand_ratio
