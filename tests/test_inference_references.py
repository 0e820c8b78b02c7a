"""Reference checks for the inferential-statistics formulas (OLS,
Welch, jackknife) — same rationale as test_formula_references.py: the
differential oracle shares the formulation, so an independent reference
must pin it."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

xy_strategy = st.lists(
    st.tuples(st.integers(1, 30), st.integers(-50, 50)), min_size=3, max_size=15
).filter(lambda pts: len({x for x, _ in pts}) >= 2)


def _ols_ref(pts):
    n = len(pts)
    mx = sum(x for x, _ in pts) / n
    my = sum(y for _, y in pts) / n
    sxy = sum((x - mx) * (y - my) for x, y in pts)
    sxx = sum((x - mx) ** 2 for x, _ in pts)
    syy = sum((y - my) ** 2 for _, y in pts)
    slope = sxy / sxx
    r2 = (sxy * sxy) / (sxx * syy) if syy > 0 else None
    return slope, my - slope * mx, r2


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(xy_strategy)
def test_ols_sufficient_stats_equal_centered_reference(spark, pts):
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], ["x", "y"]
    )
    s = df.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).first()
    slope = (s.n * s.sxy - s.sx * s.sy) / (s.n * s.sxx - s.sx * s.sx)
    intercept = (s.sy - slope * s.sx) / s.n
    want_slope, want_intercept, want_r2 = _ols_ref(pts)
    assert abs(slope - want_slope) < 1e-8 * max(1, abs(want_slope))
    assert abs(intercept - want_intercept) < 1e-7 * max(1, abs(want_intercept))
    if want_r2 is not None:
        r2 = (s.n * s.sxy - s.sx * s.sy) ** 2 / (
            (s.n * s.sxx - s.sx * s.sx) * (s.n * s.syy - s.sy * s.sy)
        )
        assert abs(r2 - want_r2) < 1e-8
        assert -1e-12 <= r2 <= 1 + 1e-12


groups_strategy = st.lists(
    st.lists(st.integers(0, 100), min_size=1, max_size=6), min_size=2, max_size=6
)


def _jackknife_ref(groups):
    flat = [v for g in groups for v in g]
    tn, ts = len(flat), sum(flat)
    full = ts / tn
    reps = [(ts - sum(g)) / (tn - len(g)) for g in groups]
    g = len(groups)
    se = math.sqrt((g - 1) / g * sum((r - full) ** 2 for r in reps))
    return full, se


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(groups_strategy)
def test_jackknife_se_matches_reference(spark, groups):
    # All leave-one-out groups must keep a nonempty remainder.
    flat_n = sum(len(g) for g in groups)
    if any(flat_n == len(g) for g in groups):
        return
    rows = [(gi, float(v)) for gi, g in enumerate(groups) for v in g]
    df = spark.createDataFrame(rows, ["src", "v"])
    grp = df.groupBy("src").agg(
        F.count("*").cast("double").alias("n"), F.sum("v").alias("s")
    )
    from pyspark.sql import Window as W

    wall = W.partitionBy()
    reps = grp.select(
        (
            (F.sum("s").over(wall) - F.col("s"))
            / (F.sum("n").over(wall) - F.col("n"))
        ).alias("loo"),
        (F.sum("s").over(wall) / F.sum("n").over(wall)).alias("full"),
        F.count("*").over(wall).alias("g"),
    )
    g = F.max("g").cast("double")
    got = reps.agg(
        F.max("full").alias("full"),
        F.sqrt(
            (g - 1) / g * F.sum(F.pow(F.col("loo") - F.col("full"), F.lit(2)))
        ).alias("se"),
    ).first()
    want_full, want_se = _jackknife_ref(groups)
    assert abs(got.full - want_full) < 1e-9
    assert abs(got.se - want_se) < 1e-9 * max(1.0, want_se), (groups, got.se, want_se)
