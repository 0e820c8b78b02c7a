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
