"""Keyset pagination: plan shape (pushed filter + top-k, no global sort
materialization) and page-walk correctness against a full sorted scan."""

from __future__ import annotations

from desdb_spark.operators.pagination_ext import (
    CURSOR_KEY,
    PAGE_SIZE,
    scan_keyset_pagination,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_keyset_plan_pushes_filter_and_takes_ordered(spark):
    df = scan_keyset_pagination(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "PushedFilters: [" in plan and "o_orderdate" in plan, plan


def test_keyset_page_equals_slice_of_full_sort(spark):
    rows = scan_keyset_pagination(spark, SF_DIR).collect()
    full = sorted(
        (
            (r.o_orderdate, r.o_orderkey)
            for r in load_table(spark, SF_DIR, "orders").collect()
        ),
    )
    import datetime

    cursor = (datetime.datetime(1998, 1, 1), CURSOR_KEY)
    want = [kv for kv in full if kv > cursor][:PAGE_SIZE]
    assert [(r.o_orderdate, r.o_orderkey) for r in rows] == want
    assert len(rows) == min(PAGE_SIZE, len(want))
