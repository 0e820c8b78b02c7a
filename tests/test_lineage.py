"""Lineage walks: recursive-CTE form ≡ driver-loop form on a synthetic
parent chain (the A7 srclist shape — SURVEY.md §3 EP3)."""

from __future__ import annotations

from desdb_spark.plans import lineage


def _fixture(spark):
    # Chains: 1->2->3->None (terminal 3), 10->11->None, 20->None (self-terminal)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, None), (10, 11), (11, None), (20, None)],
        "id bigint, parent_id bigint",
    )
    roots = spark.createDataFrame([(1,), (10,), (20,)], "id bigint")
    return edges, roots


EXPECTED = {1: (3, 2), 10: (11, 1), 20: (20, 0)}


def test_recursive_cte_walk(spark):
    edges, roots = _fixture(spark)
    got = {
        r.root_id: (r.terminal_id, r.depth)
        for r in lineage.lineage_walk_recursive(edges, roots).collect()
    }
    assert got == EXPECTED


def test_driver_loop_walk(spark):
    edges, roots = _fixture(spark)
    got = {
        r.root_id: (r.terminal_id, r.depth)
        for r in lineage.lineage_walk_loop(edges, roots).collect()
    }
    assert got == EXPECTED


def test_loop_respects_max_depth(spark):
    # 100-long chain, capped at depth 5: walk stops early, no hang.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100)] + [(100, None)], "id bigint, parent_id bigint"
    )
    roots = spark.createDataFrame([(0,)], "id bigint")
    out = lineage.lineage_walk_loop(edges, roots, max_depth=5).collect()
    assert len(out) == 1
    assert out[0].depth == 5


def test_generic_asof_join_matches_merge_asof_semantics(spark):
    """asof_join == the correlated-subquery definition, both directions."""
    from datetime import datetime

    from desdb_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0), "a"),
         (1, datetime(2024, 1, 1, 12, 0), "b"),
         (2, datetime(2024, 1, 1, 11, 0), "c")],
        "uid bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 9, 0), 10.0),
         (1, datetime(2024, 1, 1, 10, 0), 20.0),   # tie with left 'a' -> matches
         (1, datetime(2024, 1, 1, 11, 0), 30.0),
         (2, datetime(2024, 1, 1, 11, 30), 40.0)],
        "uid bigint, ts timestamp, px double",
    )
    back = {(r.uid, r.tag): r.px for r in
            asof_join(left, right, on="ts", by="uid").collect()}
    assert back == {(1, "a"): 20.0, (1, "b"): 30.0, (2, "c"): None}
    fwd = {(r.uid, r.tag): r.px for r in
           asof_join(left, right, on="ts", by="uid", direction="forward").collect()}
    assert fwd == {(1, "a"): 20.0, (1, "b"): None, (2, "c"): 40.0}

    # Explicit [] means "keys only", not "all right columns" (ADVICE r1).
    keys_only = asof_join(left, right, on="ts", by="uid", right_cols=[])
    assert set(keys_only.columns) == {"uid", "ts", "tag"}

    # A right column that collides with a left column must raise, not
    # silently produce duplicate output columns.
    import pytest

    clash = right.withColumnRenamed("px", "tag")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, clash, on="ts", by="uid")
