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


def test_q6_pushes_all_predicates_and_prunes_columns(spark):
    """Q6 is the pushdown showcase: every predicate reaches the parquet
    scan and ReadSchema carries only the 4 needed lineitem columns."""
    from desdb_spark.operators import relational_ext3

    plan = _plan(relational_ext3.scan_agg_q6(spark, SF_DIR))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed[0], pushed[0]
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_extendedprice" in read
    for col in ("l_orderkey", "l_partkey", "l_tax", "l_returnflag"):
        assert col not in read, read


def test_q18_top100_uses_take_ordered(spark):
    """The having-IN large-orders query must plan TakeOrderedAndProject,
    never a global sort before the limit."""
    from desdb_spark.operators import relational_ext3

    plan = _plan(relational_ext3.subq_having_in_q18(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan


def test_q22_plans_scalar_subquery_not_join(spark):
    """The global-average threshold must be a ScalarSubquery (computed
    once, inlined) — not a join of any kind against the 1-row aggregate."""
    from desdb_spark.operators import relational_ext3

    df = relational_ext3.subq_scalar_antijoin_q22(spark, SF_DIR)
    plan = _plan(df)
    assert "Subquery" in plan or "subquery" in plan, plan
    # the anti-join (NOT EXISTS) is the only join in the plan
    assert "LeftAnti" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q7_broadcasts_only_nation_arms(spark):
    """Both nation roles broadcast (fixed cardinality); the orderkey
    exchange stays the only big shuffle — no BNLJ from the pair filter."""
    from desdb_spark.operators import relational_ext3

    plan = _plan(relational_ext3.join_two_dim_pair_q7(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q17_reuses_partkey_exchange(spark):
    """The per-part average and the fact⋈avg join hash on the same key;
    Catalyst must not plan two separate lineitem shuffles on l_partkey.
    We assert structurally: at most one Exchange hashpartitioning on
    l_partkey feeds the join (the other side reuses or chains)."""
    from desdb_spark.operators import relational_ext3

    plan = _plan(relational_ext3.subq_scalar_per_group_q17(spark, SF_DIR))
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([a-z_0-9#]+)", plan)
    partkey_exchanges = [e for e in exchanges if e.startswith("l_partkey")]
    # lineitem appears twice (fact + avg input); both hash on l_partkey.
    # AQE may reuse — accept <= 2 but never more.
    assert len(partkey_exchanges) <= 2, plan


def test_topk_per_group_pushes_rank_limit(spark):
    """Per-group top-k must plan WindowGroupLimit with a Partial pass
    before the exchange — each map task keeps only its local top-3 per
    group, so the shuffle carries O(groups x k) rows."""
    from desdb_spark.operators import relational_ext7

    plan = _plan(relational_ext7.topk_per_group(spark, SF_DIR))
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan


def test_offset_page_folds_into_take_ordered(spark):
    """LIMIT k OFFSET n must plan one TakeOrderedAndProject(n+k) — no
    global sort, no separate offset stage."""
    from desdb_spark.operators import relational_ext7

    plan = _plan(relational_ext7.sort_offset_page(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "offset=100" in plan
    assert plan.count("Sort ") == 0 or "Sort [o_totalprice" not in plan


def test_filter_clause_single_aggregate(spark):
    """All conditional measures must evaluate inside ONE hash aggregate
    (one scan, one exchange) - not one aggregate per filtered measure."""
    from desdb_spark.operators import relational_ext7

    plan = _plan(relational_ext7.agg_filter_clause(spark, SF_DIR))
    assert plan.count("Exchange") == 1, plan
    assert plan.count("FileScan") == 1


def test_keep_best_quality_single_exchange(spark):
    """Both windows (group size + survivor rank) partition by the
    materialized digest column - exactly one exchange in the plan."""
    from desdb_spark.extensions import dedup_ext

    plan = _plan(dedup_ext.dedup_keep_best_quality(spark, SF_DIR))
    assert plan.count("Exchange") == 1, plan
