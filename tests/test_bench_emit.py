"""Pin bench.py's driver-parseable output framing (VERDICT r12 item 1).

The external driver keeps the LAST ~2000 characters of bench stdout and
parses the FINAL line as JSON; BENCH_r12.json recorded ``parsed: null``
because the single detail line outgrew that window. These tests pin the
compact-final-line contract against worst-case field widths so suite
growth can never silently overrun the window again, and pin the
baseline-ratio constants against BASELINE.md so they cannot drift.
"""

from __future__ import annotations

import json
import os
import re

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worst_case_result(with_errors: bool) -> dict:
    # Every float rendered at its widest plausible repr (xxx.xxxx) and
    # every suite at its full current size.
    queries = {name: 123.4567 for name in bench.HEADLINE}
    result = {
        "metric": "headline_suite_warm_median_total",
        "value": 1357.9024,
        "unit": "sec",
        "queries": {**queries, **({"join_anti_error": "X" * 300} if with_errors else {})},
        "headline_dispersion": {
            k: {"min": 111.1111, "max": 999.9999} for k in queries
        },
        "queries_floor_adj": {k: 123.4567 for k in queries},
        "value_floor_adj": 1357.9024,
        "sf": 0.1,
        "floor_sec": 0.1575,
        "cold_first_action_sec": 1.1519,
        "floor_after_sec": 0.0652,
        "baseline_total_sec": 0.7867,
        "ratio_floor_adj": 1.726,
        "baseline_sameday_total_sec": 0.6543,
        "ratio_sameday": 1.726,
        "headline_duckdb_sameday": {name: 123.4567 for name in bench.HEADLINE},
        "llm_queries": {name: 123.4567 for name in bench.LLM_SUITE},
        "llm_dispersion": {
            k: {"min": 111.1111, "max": 999.9999} for k in bench.LLM_SUITE
        },
        "llm_total_sec": 864.1975,
        "llm_queries_sf1": {name: 123.4567 for name in bench.LLM_SF1_SUITE},
        "llm_sf1_dispersion": {
            k: {"min": 111.1111, "max": 999.9999} for k in bench.LLM_SF1_SUITE
        },
        "llm_sf1_duckdb_sameday": {
            name: 123.4567 for name in bench.LLM_SF1_SUITE
        },
        "llm_sf1_ratio_frozen": {name: 12.345 for name in bench.LLM_SF1_SUITE},
        "llm_sf1_ratio_sameday": {name: 12.345 for name in bench.LLM_SF1_SUITE},
        "llm_sf1_total_sec": 740.7404,
        "lake_queries": {name: 123.4567 for name in bench.LAKE_SUITE},
        "lake_dispersion": {
            k: {"min": 111.1111, "max": 999.9999} for k in bench.LAKE_SUITE
        },
        "lake_total_sec": 370.3702,
        "ambient_load_warning": True,
        "floor_ratio_vs_historical": 1.43,
        "sha": "abcdef0+dirty",
        "load_note": "loaded@99.99x_floor",
        "cpus": 32,
    }
    if with_errors:
        result["op_errors"] = [f"{'y' * 60}_{i}_error" for i in range(8)]
    return result


def test_compact_line_fits_driver_window():
    for with_errors in (False, True):
        compact = bench.compact_line(_worst_case_result(with_errors))
        line = json.dumps(compact)
        assert len(line) <= bench.COMPACT_LINE_CAP, (with_errors, len(line))
        # The driver contract keys survive compaction.
        for key in ("metric", "value", "unit", "sf", "floor_sec"):
            assert key in compact, key
        # Floor attribution (VERDICT r12 item 4) survives compaction.
        for key in ("value_floor_adj", "ratio_floor_adj", "floor_after_sec"):
            assert key in compact, key
        assert json.loads(line) == compact


def test_compact_line_keeps_headline_queries_when_clean():
    compact = bench.compact_line(_worst_case_result(with_errors=False))
    # All 11 headline cells present as floats; error strings never leak in.
    assert set(compact["queries"]) == set(bench.HEADLINE)
    assert all(isinstance(v, float) for v in compact["queries"].values())


def test_compact_line_carries_floor_adjusted_cells_and_cpus():
    """r17 (VERDICT r16 items 2/7): the driver-parsed line carries the
    per-query floor-adjusted cells (band-shift vs plan-change separation)
    and the core-count stamp; both survive a clean compaction."""
    compact = bench.compact_line(_worst_case_result(with_errors=False))
    assert compact["cpus"] == 32
    assert set(compact["queries_floor_adj"]) == set(bench.HEADLINE)


def test_detail_path_routes_by_core_count(monkeypatch):
    """VERDICT r16 item 1: a low-core validation run must never overwrite
    the positional 32-core BENCH_DETAIL.json."""
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    assert bench.detail_path().endswith("BENCH_DETAIL_c8.json")
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "32")
    assert bench.detail_path().endswith("BENCH_DETAIL.json")


def test_compact_drop_order_sheds_sf1_before_headline():
    result = _worst_case_result(with_errors=True)
    # Inflate the error payload until something must be dropped.
    result["op_errors"] = ["z" * 290 for _ in range(8)]
    compact = bench.compact_line(result)
    assert len(json.dumps(compact)) <= bench.COMPACT_LINE_CAP
    # Headline queries are the last thing to go.
    assert "queries" in compact


def test_headline_and_baseline_keys_in_parity():
    """ratio_floor_adj divides value_floor_adj (summed over ALL timed
    headline cells) by baseline_total (summed over cells present in
    BASELINE_HEADLINE_SEC) — a 12th HEADLINE op without a BASELINE.md
    row would silently inflate the ratio. Pin exact key parity."""
    assert set(bench.HEADLINE) == set(bench.BASELINE_HEADLINE_SEC)


def test_baseline_constants_match_baseline_md():
    """BASELINE_HEADLINE_SEC mirrors BASELINE.md's measured table."""
    text = open(os.path.join(REPO, "BASELINE.md")).read()
    section = text.split("## Measured baseline", 1)[1].split("## ", 1)[0]
    parsed = {}
    for m in re.finditer(r"\| `(\w+)`[^|]* \| ([\d .]+) \|", section):
        parsed[m.group(1)] = round(float(m.group(2).replace(" ", "")) / 1000, 4)
    assert parsed == bench.BASELINE_HEADLINE_SEC


def test_sf1_baseline_constants_match_baseline_md():
    """BASELINE_LLM_SF1_SEC (the frozen side of the r14 dual-ratio sf1
    cells) mirrors BASELINE.md's sf1 table and covers exactly the arm's
    suite — a suite addition without a frozen cell would silently lose
    its ratio_frozen."""
    text = open(os.path.join(REPO, "BASELINE.md")).read()
    section = text.split("## LLM-pipeline suite at sf1", 1)[1].split("## ", 1)[0]
    parsed = {}
    for m in re.finditer(r"\| `(\w+)`[^|]* \| ([\d .]+) \|", section):
        parsed[m.group(1)] = round(float(m.group(2).replace(" ", "")) / 1000, 4)
    assert parsed == bench.BASELINE_LLM_SF1_SEC
    assert set(bench.LLM_SF1_SUITE) == set(bench.BASELINE_LLM_SF1_SEC)


def test_compact_sf1_cells_carry_both_ratios():
    compact = bench.compact_line(_worst_case_result(with_errors=False))
    for name in bench.LLM_SF1_SUITE:
        sec, rf, rs = compact["llm_sf1"][name]
        assert isinstance(sec, float) and isinstance(rf, float), name
        assert isinstance(rs, float), name


def test_git_sha_matches_head_at_emit_time():
    """VERDICT r14 item 3: the provenance stamp must be the sha of the
    code actually measured — bench.git_sha() read at emit time must
    agree with an independent rev-parse of HEAD run now. The dirty bit
    is asserted only when the tree state is stable across the check
    (snapshots taken before AND after git_sha agree) — a concurrent
    writer touching a tracked file between non-atomic status calls is
    not a provenance bug (post-review flakiness fix)."""
    import subprocess

    def status() -> bool:
        return bool(subprocess.run(
            ["git", "-C", REPO, "status", "--porcelain"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip())

    head = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, timeout=10,
    ).stdout.strip()
    dirty_before = status()
    stamped = bench.git_sha()
    dirty_after = status()
    assert stamped.split("+", 1)[0] == head, (stamped, head)
    if dirty_before == dirty_after:
        assert stamped.endswith("+dirty") == dirty_after, stamped


def test_compact_line_always_carries_provenance():
    for with_errors in (False, True):
        compact = bench.compact_line(_worst_case_result(with_errors))
        assert compact["sha"] == "abcdef0+dirty"
        assert compact["load_note"] == "loaded@99.99x_floor"


def test_compact_sheds_derived_fields_with_their_sources():
    """ADVICE r14: shedding drops units, so a retained field can never
    reference shed context — op_error_count goes with op_errors, the
    floor-adjusted ratio with the value it derives from, the same-day
    ratio with its denominator. Force deep shedding with an oversized
    payload and check the pairings at every depth."""
    result = _worst_case_result(with_errors=True)
    result["op_errors"] = ["z" * 290 for _ in range(8)]
    # Inflate headline floats' rendering to force shedding past the
    # error unit and into the adjunct pairs.
    result["queries"] = {k: 123456789.1234567 for k in bench.HEADLINE}
    compact = bench.compact_line(result)
    assert len(json.dumps(compact)) <= bench.COMPACT_LINE_CAP
    assert ("op_errors" in compact) == ("op_error_count" in compact)
    assert ("value_floor_adj" in compact) == ("ratio_floor_adj" in compact)
    assert ("ratio_sameday" in compact) == (
        "baseline_sameday_total_sec" in compact
    )
