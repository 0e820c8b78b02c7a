"""Round-8d: tolerance as-of properties — consistency with the
unbounded join_asof (same latest-click, only freshness-gated), the
three-way class partition, and that the fixture exercises all three
classes."""

from __future__ import annotations

import datetime as dt

from desdb_spark.operators.asof_tolerance import (
    TOL_HOURS,
    join_asof_tolerance,
)
from desdb_spark.operators.joins import join_asof
from tests.conftest import SF_DIR


def test_consistent_with_unbounded_asof(spark):
    base = {
        r.event_id: r.last_click_ts
        for r in join_asof(spark, SF_DIR).collect()
    }
    rows = join_asof_tolerance(spark, SF_DIR).collect()
    assert {r.event_id for r in rows} == set(base)
    tol = dt.timedelta(hours=TOL_HOURS)
    seen = set()
    for r in rows:
        last = base[r.event_id]
        if last is None:
            assert r.staleness == "never" and r.fresh_click_ts is None
        elif last >= r.ts - tol:
            assert r.staleness == "fresh" and r.fresh_click_ts == last
        else:
            assert r.staleness == "stale" and r.fresh_click_ts is None
        seen.add(r.staleness)
    assert seen == {"fresh", "stale", "never"}
