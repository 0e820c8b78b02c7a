"""The rotation planner (tools/plan_window.py) must agree with the
facts the registry tests already pin — it is advisory, but wrong
arithmetic would mis-plan a whole round's evidence."""

from __future__ import annotations

from tools.plan_window import WINDOW, module_vintages, newest_green_rounds, propose


def test_newest_green_rounds_matches_known_rows():
    greens = newest_green_rounds()
    # Facts pinned by the committed CORRECTNESS artifacts:
    assert greens["text_bm25_search"] >= 13
    assert greens["join_salted_skew"] >= 4
    assert all(r >= 1 for r in greens.values())


def test_vintages_cover_every_registered_module():
    from desdb_spark.registry import all_operators

    mods = {d["module"] for d in module_vintages()}
    assert mods == {op.fn.__module__ for op in all_operators().values()}


def test_propose_leads_with_changed_and_fills_to_window():
    prop = propose(["desdb_spark.extensions.span_dedup", "line_dedup"])
    window = prop["window"]
    assert window[0]["module"] == "desdb_spark.extensions.span_dedup"
    assert window[1]["module"] == "desdb_spark.extensions.line_dedup"
    assert prop["total"] <= WINDOW
    assert prop["short_by"] == WINDOW - prop["total"]
    total = sum(len(d["ops"]) for d in window)
    assert total == prop["total"]
    # fills are vintage-sorted after the changed head
    fills = window[2:]
    vintages = [d["vintage"] for d in fills]
    assert vintages == sorted(vintages)


def test_assume_round_is_an_explicit_parameter():
    """ADVICE r14: the next-round preview threads through parameters,
    not a globals() patch, and 0 is honored (compared against None)."""
    from desdb_spark.registry import all_operators

    window_ops = list(all_operators())[:WINDOW]
    real = newest_green_rounds()
    bumped = newest_green_rounds(assume_current_window_round=99)
    for n in window_ops:
        assert bumped[n] == 99, n
    # non-window ops unchanged
    for n in set(real) - set(window_ops):
        assert bumped.get(n, 0) == real[n]
    # 0 is a valid (no-op, but honored) assumption, not silently ignored
    zeroed = newest_green_rounds(assume_current_window_round=0)
    for n in window_ops:
        assert zeroed.get(n, 0) == max(real.get(n, 0), 0)
    # and it reaches propose() through the explicit parameter
    prop = propose([], assume_current_window_round=99)
    head_vintages = {d["module"]: d["vintage"] for d in prop["window"]}
    assert "desdb_spark.extensions.span_dedup" not in head_vintages or (
        head_vintages["desdb_spark.extensions.span_dedup"] == 99
    )


def test_pack_fills_finds_multi_module_combinations():
    from tools.plan_window import _pack_fills

    mk = lambda name, n, v: {"module": name, "ops": [f"{name}.{i}" for i in range(n)], "rows_only": [], "vintage": v}  # noqa: E731
    fills = [mk("a", 3, 5), mk("b", 4, 6), mk("c", 2, 7), mk("d", 7, 8)]
    # no single module has 5 ops, but a(3)+c(2) fits — oldest-biased
    combo = _pack_fills(fills, 5)
    assert [d["module"] for d in combo] == ["a", "c"]
    # impossible exact gap -> maximal partial (caller reports short_by)
    assert _pack_fills(fills, 1) == []
    # the review repro: greedy-then-patch returned 4/5 for sizes [4,3,2]
    # into 5 slots because everything it deferred exceeded the final
    # gap; the knapsack must find 3+2 = exactly 5.
    g = [mk("g4", 4, 1), mk("g3", 3, 2), mk("g2", 2, 3)]
    combo = _pack_fills(g, 5)
    assert sum(len(d["ops"]) for d in combo) == 5
    assert [d["module"] for d in combo] == ["g3", "g2"]
