"""ANN serving path: top-k results must be internally consistent and hit
the recall floor against the exact (NumPy brute-force) top-k on the
planted query set — the VERDICT r6 item-7 acceptance bar."""

from __future__ import annotations

import numpy as np

from desdb_spark.extensions.ann_serving import (
    DEFAULT_K,
    ann_query_topk_lib,
    planted_queries,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def _exact_topk(spark, queries, k):
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    rows = e.collect()  # test-side ground truth only (fixture-sized)
    ids = np.array([r.vec_id for r in rows])
    M = np.stack([np.asarray(r.embedding, dtype="float64") for r in rows])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    out = {}
    for qid, vec in queries:
        q = np.asarray(vec, dtype="float64")
        sims = Mn @ (q / np.linalg.norm(q))
        mask = ids != qid  # serving excludes self-matches
        order = np.argsort(-sims[mask])[:k]
        out[qid] = list(ids[mask][order])
    return out


def test_ann_query_topk_recall_floor(spark):
    queries = planted_queries(spark, SF_DIR)
    assert len(queries) == 8
    got = ann_query_topk_lib(spark, SF_DIR, queries=queries, k=DEFAULT_K).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    exact = _exact_topk(spark, queries, DEFAULT_K)
    assert set(by_q) == {qid for qid, _ in queries}
    hits = total = 0
    for qid, rows in by_q.items():
        ranks = [r.rank for r in rows]
        assert ranks == list(range(1, len(rows) + 1)), qid
        sims = [r.cos_sim for r in rows]
        assert sims == sorted(sims, reverse=True), qid
        assert all(r.nn_id != qid for r in rows), "self-match leaked"
        hits += len(set(r.nn_id for r in rows) & set(exact[qid]))
        total += len(exact[qid])
    recall = hits / total
    assert recall >= 0.9, f"recall@{DEFAULT_K} = {recall:.3f} < 0.9"


def test_ann_query_topk_external_vector(spark):
    """A query vector NOT in the corpus (perturbed planted vector) must
    still serve k neighbors — the true serving scenario."""
    (qid, vec), *_ = planted_queries(spark, SF_DIR)
    noisy = [x + 0.01 for x in vec]
    got = ann_query_topk_lib(
        spark, SF_DIR, queries=[(10_000_000, noisy)], k=5
    ).collect()
    assert [r.rank for r in got] == [1, 2, 3, 4, 5]
    # its nearest neighbor should be the vector it was perturbed from
    assert got[0].nn_id == qid


def test_export_run_token_reds_on_cross_run_overwrite(spark):
    """r14 hardening (VERDICT r13 item 5): every export row carries a
    per-run token and the hashed frame carries n_runs =
    count(distinct run_token). A torn/mixed overwrite (the concurrent-
    harness failure mode) makes the static oracle read n_runs=2 where
    the op's report read 1 — a deterministic value-mismatch red instead
    of reliance on aggregate coincidence. (A WHOLE stale same-code
    export deliberately still hashes equal on content, so the check
    does not depend on the external harness's op-vs-oracle ordering;
    the token VALUE itself is asserted here, where order is ours.)"""
    import duckdb

    from desdb_spark.extensions.ann_serving import SERVING_EXPORT_DIR
    from desdb_spark.registry import all_operators

    op = all_operators()["ann_query_topk"]
    report = op.fn(spark, SF_DIR).toPandas()
    assert set(report["n_runs"]) == {1}

    con = duckdb.connect()
    export_tokens = set(
        con.execute(
            f"SELECT DISTINCT run_token FROM "
            f"read_parquet('{SERVING_EXPORT_DIR}/*.parquet')"
        ).df()["run_token"]
    )
    assert len(export_tokens) == 1  # the fresh run's own token

    # Torn overwrite: a foreign run's rows land BESIDE the current ones
    # (two distinct tokens in the dir).
    doctored = con.execute(
        "SELECT query_id, nn_id, sim_micros, 'foreign-run' AS run_token "
        f"FROM read_parquet('{SERVING_EXPORT_DIR}/*.parquet')"
    ).arrow()
    con.register("doctored", doctored)
    con.execute(
        f"COPY doctored TO '{SERVING_EXPORT_DIR}/foreign.parquet' "
        "(FORMAT PARQUET)"
    )
    oracle = con.execute(op.oracle).df()
    assert set(oracle["n_runs"]) == {2}, (
        "a torn concurrent export must red deterministically on n_runs"
    )
    assert "foreign-run" not in export_tokens


def test_serving_candidates_match_independent_recompute(spark):
    """Pin candidate GENERATION, not just its downstream ranking: the
    exported candidate table is the hash oracle's input, so probe
    admission, the broadcast cell equi-join, self-exclusion, and dedup
    all sit upstream of the differential check (the SURVEY §2C scope
    note). Recompute the full candidate set independently in NumPy from
    the same memoized centroids and assert exact (query, neighbor) set
    equality, with similarities within 1 integer micro (NumPy pairwise
    summation vs Spark's left-fold differ in last ulps)."""
    import numpy as np

    from desdb_spark.extensions.ann_serving import (
        DEFAULT_NPROBE,
        _ivf_centers,
        _query_candidates,
        planted_queries,
    )

    queries = planted_queries(spark, SF_DIR)
    C = _ivf_centers(spark, SF_DIR)
    c_sq = (C * C).sum(axis=1)

    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )  # fixture-sized ground truth (500 vectors at sf0.001)
    ids = np.array([r.vec_id for r in rows])
    E = np.stack([np.asarray(r.embedding, dtype="float64") for r in rows])
    # Home cells via the op's own distance expression shape.
    home = np.argsort(-2.0 * (E @ C.T) + c_sq[None, :], axis=1)[:, 0]
    cell_of = dict(zip(ids.tolist(), home.tolist()))

    expected: dict = {}
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    by_id = {int(i): En[k] for k, i in enumerate(ids)}
    for qid, vec in queries:
        q = np.asarray(vec, dtype="float64")
        probed = set(
            np.argsort(-2.0 * (q @ C.T) + c_sq, axis=0)[:DEFAULT_NPROBE].tolist()
        )
        qn = q / np.linalg.norm(q)
        for vid in ids.tolist():
            if vid != qid and cell_of[vid] in probed:
                expected[(qid, vid)] = float(qn @ by_id[vid])

    got = _query_candidates(spark, SF_DIR, queries, DEFAULT_NPROBE).collect()
    got_pairs = {(r.query_id, r.nn_id): r.sim_micros for r in got}
    assert set(got_pairs) == set(expected), (
        f"candidate set mismatch: spark-only="
        f"{sorted(set(got_pairs) - set(expected))[:5]} "
        f"numpy-only={sorted(set(expected) - set(got_pairs))[:5]}"
    )
    for pair, sim in expected.items():
        assert abs(got_pairs[pair] - round(sim * 1_000_000)) <= 1, pair
