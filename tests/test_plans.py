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


def test_bloom_runtime_filter_injected(spark):
    """Under the forcing confs, the optimizer must inject a Bloom filter
    (might_contain) on the lineitem probe side of the shuffle join. The
    registered op materializes under these confs; this pins the plan."""
    from pyspark.sql import functions as F

    from desdb_spark.operators.joins_ext2 import _scoped_confs
    from desdb_spark.session import load_table

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = (
        load_table(spark, SF_DIR, "orders")
        .where((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000))
        .select("o_orderkey")
    )
    with _scoped_confs(
        spark,
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "500MB",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        },
    ):
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        opt = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, opt


def test_bloom_confs_restored_after_op(spark):
    """join_bloom_runtime_filter must leave the session's broadcast
    threshold exactly as it found it."""
    from desdb_spark.operators import joins_ext2

    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    joins_ext2.join_bloom_runtime_filter(spark, SF_DIR)
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before


def test_interval_overlap_is_equi_not_cross(spark):
    """The bucketed interval join must plan an equi-join on the bucket —
    never a cartesian/nested-loop theta plan."""
    from desdb_spark.operators import joins_ext2

    plan = _plan(joins_ext2.join_interval_overlap(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_matches_theta_oracle(spark):
    """Bucketed candidates + overlap filter must equal the naive theta
    join on planted intervals, including boundary cases (touching
    intervals do NOT overlap; straddling buckets do)."""
    from pyspark.sql import functions as F

    from desdb_spark.operators.joins_ext2 import interval_overlap_join

    def T(s):
        return F.to_timestamp(F.lit(s))

    left = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00", "2024-01-01 01:50:00"),
         ("b", "2024-01-01 03:00:00", "2024-01-01 03:30:00"),
         ("c", "2024-01-01 05:59:00", "2024-01-01 06:01:00")],
        ["lid", "s", "e"],
    ).select("lid", F.to_timestamp("s").alias("l_start"), F.to_timestamp("e").alias("l_end"))
    right = spark.createDataFrame(
        [("x", "2024-01-01 01:49:00", "2024-01-01 02:10:00"),   # overlaps a
         ("y", "2024-01-01 03:30:00", "2024-01-01 04:00:00"),   # touches b: NO
         ("z", "2024-01-01 06:00:30", "2024-01-01 07:00:00")],  # overlaps c across bucket
        ["rid", "s", "e"],
    ).select("rid", F.to_timestamp("s").alias("r_start"), F.to_timestamp("e").alias("r_end"))

    got = {
        (r.lid, r.rid)
        for r in interval_overlap_join(left, right, bucket_seconds=3600).collect()
    }
    theta = {
        (r.lid, r.rid)
        for r in left.crossJoin(right)
        .where((F.col("l_start") < F.col("r_end")) & (F.col("r_start") < F.col("l_end")))
        .collect()
    }
    assert got == theta == {("a", "x"), ("c", "z")}
