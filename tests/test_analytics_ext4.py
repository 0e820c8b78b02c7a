"""Growth accounting identity and entropy bounds."""

from __future__ import annotations

import math

from desdb_spark.extensions.analytics_ext4 import (
    analytics_growth_accounting,
    text_char_entropy,
)
from tests.conftest import SF_DIR


def test_waterfall_identity_holds_row_exactly(spark):
    rows = analytics_growth_accounting(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert (
            r.new_cents + r.expansion_cents - r.contraction_cents - r.churned_cents
            == r.net_change_cents
        ), r
        assert min(r.new_cents, r.expansion_cents, r.contraction_cents,
                   r.churned_cents) >= 0


def test_entropy_within_alphabet_bounds(spark):
    rows = text_char_entropy(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.entropy_bits <= math.log2(r.n_distinct_chars) + 1e-6, r
