"""Catalog stats / skew profile / curation composite semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.operators.stats_catalog import (
    diag_column_stats,
    diag_join_key_skew,
    pipeline_curate_end2end,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_column_stats_invariants(spark):
    o = load_table(spark, SF_DIR, "orders")
    n = o.count()
    rows = {r.col: r for r in diag_column_stats(spark, SF_DIR).collect()}
    assert set(rows) == {"o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"}
    for r in rows.values():
        assert 0 <= r.n_nulls <= n
        assert 1 <= r.ndv <= n - r.n_nulls
        assert r.min_val <= r.max_val or r.ndv == 1
    assert rows["o_orderstatus"].ndv <= 3  # accepted-values domain


def test_skew_profile_bounds(spark):
    r = diag_join_key_skew(spark, SF_DIR).first()
    li = load_table(spark, SF_DIR, "lineitem")
    assert r.n_rows == li.count()
    assert r.n_keys == li.select("l_orderkey").distinct().count()
    # Skew factor is max/mean, so it is >= 1 by definition and equals
    # max_rows * n_keys / n_rows exactly.
    assert r.skew_factor >= 1.0
    assert abs(r.skew_factor - r.max_rows * r.n_keys / r.n_rows) < 1e-3
    assert 0.0 <= r.heavy_share <= 1.0


def test_curation_composite_equals_staged_evaluation(spark):
    # Re-run the three stages as separate DataFrame programs and compare
    # with the fused op — composition must not change semantics.
    d = load_table(spark, SF_DIR, "documents")
    gated = d.withColumn("toks", F.size(F.split("text", " "))).where(
        F.col("n_chars").between(100, 500) & (F.col("toks") >= 20)
    )
    canon = gated.withColumn(
        "digest", F.md5(F.lower(F.trim("text")).cast("binary"))
    ).collect()
    best: dict = {}
    for r in canon:
        key = r.digest
        cand = (r.toks, r.doc_id, r.lang)
        if key not in best or (-cand[0], cand[1]) < (-best[key][0], best[key][1]):
            best[key] = cand
    want: dict = {}
    for toks, _, lang in best.values():
        n, t = want.get(lang, (0, 0))
        want[lang] = (n + 1, t + toks)
    got = {
        r.lang: (r.n_docs, r.n_tokens)
        for r in pipeline_curate_end2end(spark, SF_DIR).collect()
    }
    assert got == want
