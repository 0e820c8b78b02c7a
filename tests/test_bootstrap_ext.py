"""Poisson-bootstrap CI semantics (the hash proves cross-engine parity;
this pins the statistical sanity the hash alone wouldn't)."""

from __future__ import annotations

from desdb_spark.extensions.bootstrap_ext import stat_bootstrap_mean_ci
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_ci_brackets_the_point_estimate(spark):
    (r,) = stat_bootstrap_mean_ci(spark, SF_DIR).collect()
    assert r.ci_lo_cents < r.ci_hi_cents
    assert r.ci_lo_cents <= r.point_mean_cents <= r.ci_hi_cents
    # point estimate equals the plain full-data mean in cents
    o = load_table(spark, SF_DIR, "orders")
    mean_cents = (
        o.selectExpr(
            "sum(cast(round(o_totalprice * 100, 0) as bigint)) s", "count(*) n"
        ).first()
    )
    assert abs(r.point_mean_cents - mean_cents.s / mean_cents.n) < 1e-3
    # interval width is plausibly sqrt(n)-scaled: nonzero but far
    # narrower than the data's own spread
    lo, hi = r.ci_lo_cents, r.ci_hi_cents
    assert 0 < (hi - lo) < 0.2 * r.point_mean_cents
