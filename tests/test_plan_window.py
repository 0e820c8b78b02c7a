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
    total = sum(len(d["ops"]) for d in window)
    assert total == prop["total"]
    # fills are vintage-sorted after the changed head
    fills = window[2:]
    vintages = [d["vintage"] for d in fills]
    assert vintages == sorted(vintages)
