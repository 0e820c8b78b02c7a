"""Physical-plan shape assertions (SURVEY.md §5.2.4).

Correct results with a wrong plan is a latent 100 TB failure: these tests
pin the scan pruning, filter pushdown, broadcast strategy, and top-k
physical operators that the scale story depends on.
"""

from __future__ import annotations

from desdb_spark.operators import joins, scans, sorts_sets
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_projection_prunes_scan(spark):
    plan = _plan(scans.scan_projection_pushdown(spark, SF_DIR))
    # ReadSchema must contain only the 3 selected columns.
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, plan
    assert "l_extendedprice" in read[0]
    assert "l_shipdate" not in read[0]
    assert "l_discount" not in read[0]


def test_predicate_reaches_parquet(spark):
    plan = _plan(scans.scan_predicate_pushdown(spark, SF_DIR))
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    assert "l_shipdate" in pushed
    assert "IsNotNull" in pushed or "GreaterThanOrEqual" in pushed


def test_star_join_broadcasts_dims(spark):
    plan = _plan(joins.join_multiway_star(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3, plan
    # The one large-large join (orders x lineitem) may be broadcast at this
    # fixture scale; what must NOT happen is a nested-loop cross product.
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_topk_uses_take_ordered(spark):
    plan = _plan(sorts_sets.topk_limit(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_strategy(spark):
    semi = _plan(joins.join_semi(spark, SF_DIR))
    anti = _plan(joins.join_anti(spark, SF_DIR))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_band_join_is_equi_not_cross(spark):
    """The bucketized theta join must not degenerate to BNLJ/cross."""
    plan = _plan(joins.join_theta_range(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
