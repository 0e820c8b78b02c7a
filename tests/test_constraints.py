"""Constraint suite / MAD outliers / k-fold: the failure path must
actually fire, planted outliers must be caught (and robustness must hold
where a mean/stddev fence breaks), and fold assignment must be total,
in-range, and stable under corpus append."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.extensions import constraints as C
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_constraint_audit_exercises_both_verdicts(spark):
    rows = {r["constraint_name"]: r for r in C.quality_constraint_audit(spark, SF_DIR).collect()}
    assert len(rows) == 6
    # Structural checks hold on the fixture...
    assert rows["uniqueness_o_orderkey"]["ok"]
    assert rows["ri_orders_customer"]["ok"]
    assert rows["range_l_quantity_1_50"]["ok"]
    # ...and the deliberately tight length gate FAILS (max n_chars > 400),
    # with the metric reporting the surviving fraction.
    gate = rows["max_length_doc_400_chars"]
    assert not gate["ok"]
    assert 0.0 < gate["metric"] < 1.0


def test_mad_catches_planted_outlier_where_zscore_fence_moves(spark):
    # 48 inliers ~100, two planted monsters of very different size. The
    # robust fence flags both; a 3-sigma mean fence computed on the SAME
    # data misses the smaller one (the bigger monster inflates sigma past
    # it) — the reason MAD is the audit default.
    vals = [100 + (i % 7) for i in range(48)] + [5000, 100000]
    df = spark.createDataFrame(
        [("xx", float(v)) for v in vals], ["lang", "n_chars"]
    )
    orig = C.load_table
    try:
        C.load_table = lambda spark, sf_dir, name: df
        row = C.stat_mad_outliers(spark, SF_DIR).first()
    finally:
        C.load_table = orig
    assert row["n_docs"] == 50
    assert row["n_outliers"] == 2, row
    stats = df.agg(
        F.avg("n_chars").alias("m"), F.stddev_samp("n_chars").alias("sd")
    ).first()
    n_z = df.where(
        F.abs(F.col("n_chars") - stats["m"]) > 3 * stats["sd"]
    ).count()
    assert n_z < 2  # the naive fence misses at least one monster


def test_kfold_total_in_range_and_append_stable(spark):
    out = C.split_kfold_assign(spark, SF_DIR)
    rows = out.collect()
    folds = {r["fold"] for r in rows}
    assert folds <= {0, 1, 2, 3, 4}
    assert sum(r["n_docs"] for r in rows) == load_table(
        spark, SF_DIR, "documents"
    ).count()
    # Append-stability: fold of a given doc_id is a pure function of the
    # id — recomputing on a prefix subset assigns identical folds.
    d = load_table(spark, SF_DIR, "documents")
    from desdb_spark.extensions.sampling_ext import weyl_uniform

    fold_expr = F.floor(F.lit(5) * weyl_uniform(F.col("doc_id"))).cast("bigint")
    full = {r["doc_id"]: r["f"] for r in d.select("doc_id", fold_expr.alias("f")).collect()}
    subset = {
        r["doc_id"]: r["f"]
        for r in d.where("doc_id % 3 = 0").select("doc_id", fold_expr.alias("f")).collect()
    }
    assert all(full[k] == v for k, v in subset.items())
