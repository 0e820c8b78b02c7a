"""Round-8e: rolling OLS slope — numpy polyfit parity at sf0.001 (the
public reference least-squares implementation, applied per trailing
window) plus the structural laws: the first row has undefined slope
(zero x-variance), den > 0 everywhere else, and the quantized ratio
reproduces num/den to 1e-6."""

from __future__ import annotations

import numpy as np

from desdb_spark.operators.rolling_regression import (
    WINDOW_DAYS,
    window_rolling_regression_slope,
)
from tests.conftest import SF_DIR


def test_rolling_slope_matches_numpy_polyfit(spark):
    rows = sorted(
        window_rolling_regression_slope(spark, SF_DIR).collect(),
        key=lambda r: r.order_date,
    )
    assert rows
    xs = np.arange(len(rows))  # consecutive-row index is NOT x; rebuild x
    days = [(r.order_date - rows[0].order_date).days for r in rows]
    ys = [r.day_cents for r in rows]
    for i, r in enumerate(rows):
        lo = max(0, i - (WINDOW_DAYS - 1))
        wx = np.array(days[lo : i + 1], dtype=np.float64)
        wy = np.array(ys[lo : i + 1], dtype=np.float64)
        if len(wx) < 2:
            assert r.slope_den == 0 and r.slope_cents_per_day_micros is None
            continue
        slope = np.polyfit(wx, wy, 1)[0]
        assert r.slope_den > 0
        got = r.slope_num / r.slope_den
        assert abs(got - slope) <= max(1e-6, abs(slope) * 1e-9)
        # quantization law: trunc(num * 1e6 / den), exact int arithmetic
        n = r.slope_num * 1000000
        q = -((-n) // r.slope_den) if n < 0 else n // r.slope_den
        assert r.slope_cents_per_day_micros == q


def test_window_covers_exactly_trailing_rows(spark):
    rows = sorted(
        window_rolling_regression_slope(spark, SF_DIR).collect(),
        key=lambda r: r.order_date,
    )
    for i, r in enumerate(rows):
        assert r.n_days == min(i + 1, WINDOW_DAYS)
