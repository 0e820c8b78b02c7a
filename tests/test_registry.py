"""Registry invariants: the driver contract is complete and well-formed."""

from __future__ import annotations

import duckdb
import pytest

from desdb_spark.registry import all_operators
from tests.conftest import SF_DIR


def test_every_operator_has_fn_and_group():
    ops = all_operators()
    assert len(ops) >= 50  # SURVEY.md §2B inventory size
    for op in ops.values():
        assert callable(op.fn)
        assert op.group, op.name
        assert op.doc, f"{op.name} missing docstring"


def test_oracle_coverage():
    ops = all_operators()
    with_oracle = [n for n, o in ops.items() if o.oracle]
    # SURVEY.md §2B: ~46 of ~55 rows hash-checkable.
    assert len(with_oracle) >= 40


def test_oracle_sql_parses_in_duckdb():
    """Every oracle must at least bind against the fixture schemas."""
    con = duckdb.connect()
    from desdb_spark.session import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    for name, op in all_operators().items():
        if op.oracle:
            try:
                con.execute(f"SELECT * FROM ({op.oracle}) LIMIT 0")
            except Exception as e:  # noqa: BLE001
                pytest.fail(f"oracle for {name} failed to bind: {e}")


def test_driver_window_union_coverage():
    """Rotation discipline (VERDICT r2/r3 item 1): every operator past the
    driver's 50-slot hash window must hold a green row in the most recent
    CORRECTNESS file — OR, for ops added mid-round after the window was
    sized (the window holds exactly 50), a green line in the committed
    full-registry selfcheck log for the current round, which stands in
    until the next rotation gives them a driver row. Either way the union
    of driver artifacts + committed selfcheck always covers the full
    registry with staleness ≤ 1 round."""
    import glob
    import json
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..")
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if not files:
        pytest.skip("no driver CORRECTNESS artifacts yet")
    latest = json.load(open(files[-1]))
    selfcheck_green: set[str] = set()
    for log in glob.glob(os.path.join(root, "SELFCHECK_r*_sf0.1.log")):
        for ln in open(log, errors="replace"):
            m = re.match(r"^(PASS|rows)\s+([a-z_0-9]+):", ln)
            if m:
                selfcheck_green.add(m.group(2))
    ops = list(all_operators())
    window, rest = ops[:50], ops[50:]
    for name in rest:
        row = latest.get(name)
        if row is None:
            assert name in selfcheck_green, (
                f"{name} is past slot 50 with no row in {files[-1]} and no "
                f"green line in a committed selfcheck log"
            )
            continue
        ok = row.get("hash_match") or (
            row.get("err") == "no_oracle" and row.get("spark_rows") is not None
        )
        assert ok, f"{name} past slot 50 but latest driver row not green: {row}"
    for name in ops:
        if name not in latest and name not in selfcheck_green:
            assert name in window, (
                f"brand-new op {name} must register inside slot 50 or carry "
                f"committed selfcheck evidence"
            )


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(all_operators())
