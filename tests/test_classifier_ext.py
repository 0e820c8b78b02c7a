"""Distributed logistic-regression loop vs an identical NumPy reference."""

from __future__ import annotations

import numpy as np

from desdb_spark.extensions.classifier_ext import (
    EARLY_STOP_TOL,
    LEARNING_RATE,
    N_ITERS,
    _features,
    quality_logreg_train,
    train_quality_logreg,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def _numpy_reference(feats_pdf, n_iters, lr, tol=EARLY_STOP_TOL):
    X = np.column_stack(
        [
            np.ones(len(feats_pdf)),
            feats_pdf["x1"].to_numpy(),
            feats_pdf["x2"].to_numpy(),
            feats_pdf["x3"].to_numpy(),
        ]
    )
    y = feats_pdf["label"].to_numpy()
    w = np.zeros(4)
    losses = []
    for _ in range(n_iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        eps = 1e-12
        losses.append(
            -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).mean()
        )
        w = w - lr * (X.T @ (p - y)) / len(y)
        if len(losses) >= 2 and losses[-2] - losses[-1] < tol:
            break
    return w, losses


def test_distributed_gd_matches_numpy(spark):
    feats = _features(load_table(spark, SF_DIR, "documents"))
    w, losses = train_quality_logreg(feats)
    ref_w, ref_losses = _numpy_reference(
        feats.toPandas(), N_ITERS, LEARNING_RATE
    )
    assert len(losses) == len(ref_losses)  # identical early-stop point
    assert np.allclose(w, ref_w, atol=1e-6), (w, ref_w)
    assert np.allclose(losses, ref_losses, atol=1e-6)
    # optimization actually progresses
    assert losses[-1] < losses[0]
    assert all(b - a < 1e-9 for a, b in zip(losses, losses[1:]))


def test_registered_op_reports_learning(spark):
    rows = quality_logreg_train(spark, SF_DIR).collect()
    final = [r for r in rows if r.iteration == -1]
    assert len(final) == 1
    (f,) = final
    iters = [r for r in rows if r.iteration >= 0]
    # early stop makes N_ITERS a ceiling, not a constant
    assert 2 <= len(iters) <= N_ITERS
    # accuracy beats the majority-class baseline
    d = load_table(spark, SF_DIR, "documents").toPandas()
    maj = max((d["lang"] == "en").mean(), 1 - (d["lang"] == "en").mean())
    assert f.train_accuracy >= maj - 1e-9
    assert f.bias is not None and f.w1 is not None
