"""Sketch error bounds and linkage recall — the semantic contracts the
rows-only driver checks can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.extensions import linkage_ext, sketches_ext
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_hll_union_estimates_within_2pct(spark):
    """lgK=14 HLL: relative standard error ≈ 0.8%; assert ≤2% vs exact
    for every per-type estimate AND the union-derived overall row."""
    est = {
        r.event_type: r.approx_users
        for r in sketches_ext.agg_hll_sketch_union(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["__all__"] = ev.select("user_id").distinct().count()
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(2, 0.02 * e), (k, est[k], e)


def test_freq_items_superset_of_true_heavy_hitters(spark):
    """KPS guarantee: no false negatives — every word with support
    > 2% must appear in the candidate array."""
    cand = set(
        sketches_ext.agg_freq_items_sketch(spark, SF_DIR).first()[
            "heavy_hitter_candidates"
        ]
    )
    d = load_table(spark, SF_DIR, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word")).where(
        F.col("word") != ""
    )
    total = words.count()
    true_heavy = {
        r.word
        for r in words.groupBy("word")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") > 0.02 * total)
        .collect()
    }
    assert true_heavy, "fixture should have >2% words"
    assert true_heavy <= cand, true_heavy - cand


def test_linkage_recovers_planted_typos(spark):
    """Every 5th customer got a planted suffix typo shaped to make the
    true source the unique nearest neighbor: every dirty record must
    link back to its own id at dist 1."""
    out = linkage_ext.linkage_blocked_fuzzy(spark, SF_DIR)
    rows = out.collect()
    n_dirty = (
        load_table(spark, SF_DIR, "customer")
        .where(F.col("c_custkey") % 5 == 0)
        .count()
    )
    assert len(rows) == n_dirty
    assert all(r.dist == 1 for r in rows)
    bad = [r for r in rows if r.matched_id != r.dirty_id]
    assert not bad, bad[:5]
