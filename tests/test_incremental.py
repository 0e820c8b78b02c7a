"""Incremental aggregate maintenance: the monoid merge must equal a
from-scratch aggregate (including the variance identity the registered
op keeps out of its bit-exact hash), and merging must handle groups
present on only one side."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.operators.incremental import merge_partials, partials
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_merge_equals_scratch_including_variance(spark):
    o = load_table(spark, SF_DIR, "orders").select("o_orderpriority", "o_totalprice")
    half_a = o.where(F.col("o_totalprice") < 150000)
    half_b = o.where(F.col("o_totalprice") >= 150000)
    merged = merge_partials(
        partials(half_a, "o_orderpriority", "o_totalprice"),
        partials(half_b, "o_orderpriority", "o_totalprice"),
        "o_orderpriority",
    )
    scratch = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("o_totalprice").alias("s"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.var_samp("o_totalprice").alias("v"),
    )
    got = {r["o_orderpriority"]: r for r in merged.collect()}
    want = {r["o_orderpriority"]: r for r in scratch.collect()}
    assert set(got) == set(want)
    for k in want:
        g, w = got[k], want[k]
        assert g["n"] == w["n"]
        assert abs(g["s"] - w["s"]) < 1e-6 * abs(w["s"])
        assert g["mn"] == w["mn"] and g["mx"] == w["mx"]
        var = (g["s2"] - g["s"] ** 2 / g["n"]) / (g["n"] - 1)
        assert abs(var - w["v"]) < 1e-9 * abs(w["v"]), (k, var, w["v"])


def test_merge_handles_one_sided_groups(spark):
    a = spark.createDataFrame([("x", 1.0), ("x", 3.0)], ["k", "v"])
    b = spark.createDataFrame([("y", 10.0)], ["k", "v"])
    m = {
        r["k"]: r
        for r in merge_partials(
            partials(a, "k", "v"), partials(b, "k", "v"), "k"
        ).collect()
    }
    assert m["x"]["n"] == 2 and m["x"]["s"] == 4.0
    assert m["x"]["mn"] == 1.0 and m["x"]["mx"] == 3.0
    assert m["y"]["n"] == 1 and m["y"]["mn"] == 10.0 and m["y"]["mx"] == 10.0


def test_merge_is_associative(spark):
    o = load_table(spark, SF_DIR, "orders").select("o_orderpriority", "o_totalprice")
    p1 = partials(o.where("o_totalprice < 100000"), "o_orderpriority", "o_totalprice")
    p2 = partials(
        o.where("o_totalprice >= 100000 AND o_totalprice < 200000"),
        "o_orderpriority",
        "o_totalprice",
    )
    p3 = partials(o.where("o_totalprice >= 200000"), "o_orderpriority", "o_totalprice")
    left = merge_partials(merge_partials(p1, p2, "o_orderpriority"), p3, "o_orderpriority")
    right = merge_partials(p1, merge_partials(p2, p3, "o_orderpriority"), "o_orderpriority")
    gl = {r["o_orderpriority"]: r for r in left.collect()}
    gr = {r["o_orderpriority"]: r for r in right.collect()}
    assert set(gl) == set(gr)
    for k in gl:
        assert gl[k]["n"] == gr[k]["n"]
        assert abs(gl[k]["s"] - gr[k]["s"]) < 1e-6
        assert gl[k]["mn"] == gr[k]["mn"] and gl[k]["mx"] == gr[k]["mx"]
