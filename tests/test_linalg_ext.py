"""Gram matrix: distributed partial-GEMM result must equal single-node
X.T @ X to tight relative tolerance, be symmetric by construction
(upper triangle), and be PSD."""

from __future__ import annotations

import numpy as np

from desdb_spark.extensions.linalg_ext import gram_matrix
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_gram_matches_numpy_and_is_psd(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    X = np.stack(
        emb.select("embedding").toPandas()["embedding"].to_numpy()
    ).astype("float64")
    want = X.T @ X
    d = want.shape[0]
    got = np.zeros((d, d))
    rows = gram_matrix(emb.repartition(8)).collect()
    assert len(rows) == d * (d + 1) // 2
    for r in rows:
        got[r.i, r.j] = r.value
        got[r.j, r.i] = r.value
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 1e-9 * scale, np.abs(got - want).max()
    evals = np.linalg.eigvalsh(got)
    assert evals.min() > -1e-8 * scale


def test_gram_output_is_one_row_per_cell(spark):
    # However the input is partitioned, the final result is exactly one
    # row per upper-triangle cell — the O(d^2)-not-O(n) contract.
    from desdb_spark.extensions.linalg_ext import emb_gram_matrix

    n = emb_gram_matrix(spark, SF_DIR).count()
    assert n == 64 * 65 // 2
