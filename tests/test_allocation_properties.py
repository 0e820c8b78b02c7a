"""Property tests for the exact-money and order-statistic algorithms:
largest-remainder allocation must conserve the pool and stay within one
cent of the exact proportional share for ANY weights; the weighted
median must match a reference scan; the KS statistic must match a
reference CDF walk."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window as W
from pyspark.sql import functions as F

weights_strategy = st.lists(st.integers(1, 50), min_size=1, max_size=8)
pools = st.integers(0, 10_000)


def _lr_reference(pool: int, ws: list[int]) -> list[int]:
    wsum = sum(ws)
    base = [pool * w // wsum for w in ws]
    rema = [(pool * w % wsum, -i) for i, w in enumerate(ws)]
    leftover = pool - sum(base)
    order = sorted(range(len(ws)), key=lambda i: (-rema[i][0], i))
    for j in order[:leftover]:
        base[j] += 1
    return base


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pools, weights_strategy)
def test_largest_remainder_conserves_and_stays_within_one_cent(spark, pool, ws):
    # Drive the same window formulation the registered op uses, on a
    # single planted parent.
    rows = [(1, i + 1, w) for i, w in enumerate(ws)]
    df = spark.createDataFrame(rows, ["k", "ln", "w"])
    wk = W.partitionBy("k")
    base = df.withColumn("wsum", F.sum("w").over(wk)).withColumn(
        "pool_cents", F.lit(pool).cast("bigint")
    )
    prod = F.col("pool_cents") * F.col("w")
    floored = base.select(
        "k",
        "ln",
        "w",
        "wsum",
        "pool_cents",
        F.floor(prod / F.col("wsum")).cast("bigint").alias("base_cents"),
        (prod % F.col("wsum")).alias("remainder"),
    ).withColumn("leftover", F.col("pool_cents") - F.sum("base_cents").over(wk))
    ranked = floored.withColumn(
        "rk", F.row_number().over(wk.orderBy(F.desc("remainder"), "ln"))
    )
    alloc = {
        r.ln: r.base_cents + (1 if r.rk <= r.leftover else 0)
        for r in ranked.collect()
    }
    got = [alloc[i + 1] for i in range(len(ws))]
    # Conservation — the non-negotiable invariant.
    assert sum(got) == pool, (pool, ws, got)
    # Quota property: every allocation is floor or ceil of its exact share.
    wsum = sum(ws)
    for g, w in zip(got, ws):
        exact = pool * w / wsum
        assert exact - 1 < g < exact + 1, (pool, ws, got)
    # And it matches the reference implementation exactly (same tie-break).
    assert got == _lr_reference(pool, ws), (pool, ws)


values_strategy = st.lists(
    st.tuples(st.integers(1, 20), st.integers(1, 9)), min_size=1, max_size=12
)


def _weighted_median_ref(pairs):
    # Lower weighted median under (value, index) total order.
    total = sum(w for _, w in pairs)
    ordered = sorted((v, i, w) for i, (v, w) in enumerate(pairs))
    cw = 0
    for v, _, w in ordered:
        cw += w
        if 2 * cw >= total:
            return v
    raise AssertionError


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values_strategy)
def test_weighted_median_matches_reference(spark, pairs):
    rows = [(1, i, float(v), w) for i, (v, w) in enumerate(pairs)]
    df = spark.createDataFrame(rows, ["g", "i", "v", "w"])
    wg = W.partitionBy("g")
    wc = wg.orderBy("v", "i")
    ranked = df.select(
        "g",
        "v",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wg).alias("tw"),
    )
    hit = (
        ranked.where(2 * F.col("cw") >= F.col("tw"))
        .withColumn("rk", F.row_number().over(wg.orderBy("cw", "v")))
        .where(F.col("rk") == 1)
        .first()
    )
    assert hit.v == float(_weighted_median_ref(pairs)), pairs


two_samples = st.tuples(
    st.lists(st.integers(0, 10), min_size=1, max_size=10),
    st.lists(st.integers(0, 10), min_size=1, max_size=10),
)


def _ks_ref(xs, ys):
    import bisect

    sx, sy = sorted(xs), sorted(ys)
    pts = sorted(set(sx) | set(sy))
    d = 0.0
    for p in pts:
        fa = bisect.bisect_right(sx, p) / len(sx)
        fb = bisect.bisect_right(sy, p) / len(sy)
        d = max(d, abs(fa - fb))
    return d


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(two_samples)
def test_ks_statistic_matches_reference(spark, samples):
    xs, ys = samples
    rows = [(v, 1, 0) for v in xs] + [(v, 0, 1) for v in ys]
    df = spark.createDataFrame(rows, ["x", "a", "b"])
    wall = W.partitionBy()
    wc = W.orderBy("x")
    cdf = df.select(
        (F.sum("a").over(wc).cast("double") / F.sum("a").over(wall)).alias("fa"),
        (F.sum("b").over(wc).cast("double") / F.sum("b").over(wall)).alias("fb"),
    )
    got = cdf.agg(F.max(F.abs(F.col("fa") - F.col("fb")))).first()[0]
    want = _ks_ref(xs, ys)
    assert abs(got - want) < 1e-12, (xs, ys, got, want)
