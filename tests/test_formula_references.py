"""Reference-implementation checks for the formula-heavy analytics ops.

The differential oracle can't catch a bug that lives in the FORMULATION
(both engines run the same SQL shape) — the KS tie-handling bug proved
it. These tests pin each formula against an independent plain-Python
reference on arbitrary planted data."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _gini_ref(vals):
    # Mean absolute difference form: G = sum_ij |xi - xj| / (2 n^2 mu),
    # times n/(n-1)... use the rank form the op implements and check the
    # two agree via the independent pairwise definition (sample form
    # without the n/(n-1) correction, matching the op's formula
    # G = 2*sum(i*y_i)/(n*sum) - (n+1)/n over ascending-sorted y).
    n = len(vals)
    s = sum(vals)
    if s == 0:
        return 0.0
    num = sum(abs(a - b) for a in vals for b in vals)
    return num / (2 * n * s)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.integers(1, 100), min_size=2, max_size=12))
def test_gini_rank_formula_equals_pairwise_definition(spark, vals):
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["id", "rev"])
    wr = W.orderBy("rev", "id")
    wall = W.partitionBy()
    ranked = df.select(
        "rev",
        F.row_number().over(wr).alias("i"),
        F.count("*").over(wall).alias("n"),
        F.sum("rev").over(wall).alias("total"),
    )
    n = F.max("n").cast("double")
    total = F.max("total")
    got = ranked.agg(
        (F.lit(2.0) * F.sum(F.col("i") * F.col("rev")) / (n * total) - (n + 1) / n)
    ).first()[0]
    want = _gini_ref(vals)
    assert abs(got - want) < 1e-9, (vals, got, want)


def _drawdown_ref(series):
    peak, worst = float("-inf"), 0
    out = []
    for v in series:
        peak = max(peak, v)
        out.append(peak - v)
    return max(out)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.integers(-50, 50), min_size=1, max_size=15))
def test_drawdown_windows_equal_reference(spark, deltas):
    # Build a cumulative series from arbitrary (possibly negative) deltas
    # so drawdown is actually exercised, unlike the all-positive fixture.
    cum = []
    c = 0
    for d in deltas:
        c += d
        cum.append(c)
    rows = [(i, v) for i, v in enumerate(cum)]
    df = spark.createDataFrame(rows, ["d", "c"])
    wd = W.orderBy("d")
    dd = df.select((F.max("c").over(wd) - F.col("c")).alias("drawdown"))
    got = dd.agg(F.max("drawdown")).first()[0]
    assert got == _drawdown_ref(cum), (cum, got)


def _cusum_argmax_ref(series):
    mu = sum(series) / len(series)
    s, best, best_i = 0.0, -1.0, -1
    for i, v in enumerate(series):
        s += v - mu
        if abs(s) > best:
            best, best_i = abs(s), i
    return best_i


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.integers(0, 100), min_size=2, max_size=15))
def test_cusum_peak_matches_reference(spark, series):
    rows = [(i, float(v)) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, ["d", "rev"]).localCheckpoint(eager=True)
    mu = df.agg(F.avg("rev")).first()[0]
    s = F.sum(F.col("rev") - F.lit(mu)).over(W.orderBy("d"))
    top = (
        df.select("d", F.abs(s).alias("abs_cusum"))
        .orderBy(F.desc("abs_cusum"), "d")
        .first()
    )
    want_i = _cusum_argmax_ref(series)
    # Argmax ties broken by earliest day in both (reference scans in
    # order and keeps the strict max → first of the tied).
    mu_ref = sum(series) / len(series)
    s_ref, best = 0.0, -1.0
    peaks = []
    for i, v in enumerate(series):
        s_ref += v - mu_ref
        peaks.append(abs(s_ref))
    best = max(peaks)
    tied = [i for i, p in enumerate(peaks) if abs(p - best) < 1e-9]
    assert top.d in tied and want_i in tied, (series, top.d, tied)
