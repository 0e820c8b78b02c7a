"""Round-8e: epoch-schedule properties — Python brute-force parity at
sf0.001 plus the schedule's defining invariants: allotments never
exceed the budget (floor division), small sources oversample hotter
than large ones under the √ flattening, and epochs×supply+remainder
reconstructs each allotment exactly."""

from __future__ import annotations

import math
from collections import Counter

from desdb_spark.extensions.epoch_schedule import (
    TOKEN_BUDGET,
    corpus_epoch_schedule,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_epoch_schedule_matches_brute_force(spark):
    docs = load_table(spark, SF_DIR, "documents").collect()
    tokens = Counter()
    for r in docs:
        tokens[r.source] += len(r.text.split(" "))
    w = {s: math.isqrt(n) for s, n in tokens.items()}
    total_w = sum(w.values())
    got = {r.source: r for r in corpus_epoch_schedule(spark, SF_DIR).collect()}
    assert set(got) == set(tokens)
    for s, n in tokens.items():
        target = TOKEN_BUDGET * w[s] // total_w
        r = got[s]
        assert r.n_tokens == n
        assert r.weight_isqrt == w[s]
        assert r.target_tokens == target
        assert r.n_full_epochs == target // n
        assert r.remainder_tokens == target % n
        assert r.oversample_micros == target * 1000000 // n
        # allotment reconstructs exactly
        assert r.n_full_epochs * n + r.remainder_tokens == target


def test_budget_and_flattening_shape(spark):
    rows = corpus_epoch_schedule(spark, SF_DIR).collect()
    assert sum(r.target_tokens for r in rows) <= TOKEN_BUDGET
    # √ flattening: the smallest source oversamples at least as hot as
    # the largest (strictly, oversample ratio is anti-monotone in size
    # up to floor effects — compare the extremes, far apart)
    rows = sorted(rows, key=lambda r: r.n_tokens)
    assert rows[0].oversample_micros >= rows[-1].oversample_micros
