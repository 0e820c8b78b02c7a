"""Round-8d: waterfill allocator properties — a pure-Python reference
implementation must agree exactly at sf0.001, and the allocator's
contract holds: allocations sum to the budget EXACTLY, never exceed
supply, capped groups all sit within one token of a common level, and
every uncapped group is smaller than every capped group's allocation."""

from __future__ import annotations

from desdb_spark.extensions.waterfill_ext import (
    BUDGET_DEN,
    BUDGET_NUM,
    corpus_waterfill_domain_caps,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def _brute(supplies):
    # supplies: {(source, lang): s}
    items = sorted(supplies.items(), key=lambda kv: (kv[1], kv[0]))
    total = sum(s for _, s in items)
    b = total * BUDGET_NUM // BUDGET_DEN
    n = len(items)
    alloc = {}
    prefix = 0
    k = 0
    for i, (key, s) in enumerate(items, start=1):
        if s * (n - i + 1) <= b - prefix:
            alloc[key] = (s, 0)
            prefix += s
            k = i
        else:
            break
    rest = items[k:]
    q, r = divmod(b - prefix, n - k)
    for j, (key, s) in enumerate(rest, start=1):
        alloc[key] = (q + (1 if j <= r else 0), 1)
    return alloc, b


def _supplies(spark):
    out = {}
    for row in load_table(spark, SF_DIR, "documents").collect():
        toks = [t for t in row.text.split(" ") if t]
        key = (row.source, row.lang)
        out[key] = out.get(key, 0) + len(toks)
    return out


def test_waterfill_matches_python_reference(spark):
    expect, b = _brute(_supplies(spark))
    rows = corpus_waterfill_domain_caps(spark, SF_DIR).collect()
    got = {
        (r.source, r.lang): (r.alloc_tokens, r.capped) for r in rows
    }
    assert got == expect
    assert sum(a for a, _ in got.values()) == b


def test_waterfill_contract(spark):
    rows = corpus_waterfill_domain_caps(spark, SF_DIR).collect()
    assert all(r.alloc_tokens <= r.supply_tokens for r in rows)
    capped = [r.alloc_tokens for r in rows if r.capped]
    uncapped = [r.alloc_tokens for r in rows if not r.capped]
    assert capped and uncapped, "budget should cap some domains only"
    assert max(capped) - min(capped) <= 1  # common level ± remainder
    assert max(uncapped) <= min(capped)  # small domains sit below the water
