"""Planted-data semantics for the pipeline-analytics ops (round 4 batch 3).

The DuckDB differential proves Spark↔DuckDB agreement on the fixtures;
these tests prove the *intended semantics* on adversarial planted inputs —
out-of-order funnels, cross-week retention, orthogonal centroids — where
the right answer is known by construction. Ops read parquet from a sf_dir,
so each test stages a tiny planted table under tmp_path and calls the op
on that directory.
"""

from __future__ import annotations

import datetime as dt

import pytest

from desdb_spark.extensions.pipeline_analytics import (
    emb_label_centroid_cosine,
    events_funnel_conversion,
    events_retention_cohort,
    text_word_topk_per_lang,
)


def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


TS = dt.datetime(2024, 1, 1, 12, 0, 0)


def _t(minutes: int) -> dt.datetime:
    return TS + dt.timedelta(minutes=minutes)


def test_funnel_strict_ordering(spark, tmp_path):
    """User 1 converts in order; user 2 clicked BEFORE viewing (must not
    count past stage 1); user 3 never clicked; user 4 purchase-first
    (only stage-1 credit)."""
    rows = [
        (1, _t(0), 1, "view", 1.0, "{}"),
        (2, _t(5), 1, "click", 1.0, "{}"),
        (3, _t(9), 1, "purchase", 1.0, "{}"),
        (4, _t(0), 2, "click", 1.0, "{}"),
        (5, _t(5), 2, "view", 1.0, "{}"),
        (6, _t(9), 2, "purchase", 1.0, "{}"),
        (7, _t(0), 3, "view", 1.0, "{}"),
        (8, _t(0), 4, "purchase", 1.0, "{}"),
        (9, _t(5), 4, "view", 1.0, "{}"),
    ]
    _write_events(spark, str(tmp_path), rows)
    out = events_funnel_conversion(spark, str(tmp_path)).collect()[0]
    assert out.n_users == 4
    assert out.n_view == 4          # users 1,2,3,4 all viewed at some point
    assert out.n_view_click == 1    # only user 1 clicked after first view
    assert out.n_full == 1          # only user 1 completed in order


def test_retention_cohorts_by_first_week(spark, tmp_path):
    """User 10 first appears in week of Jan 1 and is active again in the
    week of Jan 15; user 20 first appears in week of Jan 8 only."""
    w0 = dt.datetime(2024, 1, 1, 9, 0)    # Monday week 0
    w1 = dt.datetime(2024, 1, 10, 9, 0)   # week of Jan 8
    w2 = dt.datetime(2024, 1, 17, 9, 0)   # week of Jan 15
    rows = [
        (1, w0, 10, "view", 1.0, "{}"),
        (2, w2, 10, "click", 1.0, "{}"),
        (3, w1, 20, "view", 1.0, "{}"),
    ]
    _write_events(spark, str(tmp_path), rows)
    got = {
        (r.cohort_week.date().isoformat(), r.active_week.date().isoformat()):
            r.n_active
        for r in events_retention_cohort(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("2024-01-01", "2024-01-01"): 1,
        ("2024-01-01", "2024-01-15"): 1,
        ("2024-01-08", "2024-01-08"): 1,
    }


def test_word_topk_tiebreak_and_limit(spark, tmp_path):
    """Seven distinct words in one language: exactly 5 survive, ordered by
    count then lexicographic word on ties."""
    docs = [(i, text, "en", "s", len(text)) for i, text in enumerate([
        "alpha alpha alpha beta beta",
        "beta gamma gamma delta",
        "epsilon zeta eta",
    ])]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = text_word_topk_per_lang(spark, str(tmp_path)).collect()
    got = {(r.lang, r.word): r.cnt for r in rows}
    assert len(rows) == 5
    assert got[("en", "alpha")] == 3 and got[("en", "beta")] == 3
    # ties at cnt=1 broken lexicographically: delta, epsilon win; eta/zeta cut
    assert ("en", "delta") in got and ("en", "epsilon") in got
    assert ("en", "eta") not in got and ("en", "zeta") not in got


def test_centroid_cosine_orthogonal_and_aligned(spark, tmp_path):
    """Label 0 vectors lie on axis x, label 1 on axis y (cosine 0),
    label 2 also on axis x (cosine 1 with label 0)."""
    import pandas as pd

    rows = []
    vid = 0
    for label, axis in ((0, 0), (1, 1), (2, 0)):
        for _ in range(3):
            v = [0.0, 0.0, 0.0, 0.0]
            v[axis] = 1.0
            rows.append((vid, v, label))
            vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    sdf = spark.createDataFrame(pdf).selectExpr(
        "CAST(vec_id AS LONG) vec_id",
        "CAST(embedding AS ARRAY<FLOAT>) embedding",
        "CAST(label AS INT) label",
    )
    sdf.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = {
        (r.label_a, r.label_b): r.cos_sim
        for r in emb_label_centroid_cosine(spark, str(tmp_path)).collect()
    }
    assert got[(0, 1)] == pytest.approx(0.0, abs=1e-6)
    assert got[(0, 2)] == pytest.approx(1.0, abs=1e-6)
    assert got[(1, 2)] == pytest.approx(0.0, abs=1e-6)
