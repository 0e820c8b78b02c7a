"""Property tests (hypothesis) for the subtle r6 algorithms.

- skyline_2d's two-phase prune must equal the brute-force Pareto
  frontier on ARBITRARY point sets and any bucket count — the prune's
  safety ("dominated in bucket ⇒ dominated globally") is the part a
  fixture can't falsify.
- apply_cdc_log must equal a per-key sequential replay for any
  interleaving of I/U/D ops.
- morton_key must be dominance-monotone (a ≤ a' and b ≤ b' ⇒ z ≤ z'),
  the property file-level min/max pruning of a z-ordered layout relies
  on (a query box's lowest corner lower-bounds every contained zkey).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_spread(x: int) -> int:
    x &= 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _py_morton(a: int, b: int) -> int:
    return _py_spread(a) | (_py_spread(b) << 1)


@given(
    st.integers(0, 0xFFFF),
    st.integers(0, 0xFFFF),
    st.integers(0, 0xFFFF),
    st.integers(0, 0xFFFF),
)
def test_morton_dominance_monotone(a1, b1, a2, b2):
    lo_a, hi_a = sorted((a1, a2))
    lo_b, hi_b = sorted((b1, b2))
    assert _py_morton(lo_a, lo_b) <= _py_morton(hi_a, hi_b)


points_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=1, max_size=14
)


def _brute_skyline(pts):
    s = set(pts)
    return sorted(
        p
        for p in s
        if not any(
            (q[0] <= p[0] and q[1] >= p[1]) and (q[0] < p[0] or q[1] > p[1])
            for q in s
        )
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(points_strategy, st.sampled_from([1, 2, 5]))
def test_skyline_matches_bruteforce(spark, pts, n_buckets):
    from desdb_spark.extensions.skyline import skyline_2d

    df = spark.createDataFrame(pts, ["cost", "benefit"])
    got = sorted(
        (r.cost, r.benefit)
        for r in skyline_2d(df, "cost", "benefit", n_buckets).collect()
    )
    assert got == _brute_skyline(pts), (pts, n_buckets)


ops_strategy = st.lists(
    st.tuples(
        st.integers(1, 4),  # key
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 99),  # payload
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops_strategy)
def test_cdc_apply_matches_sequential_replay(spark, ops):
    from desdb_spark.operators.cdc import apply_cdc_log

    rows = [(k, seq, op, float(v)) for seq, (k, op, v) in enumerate(ops)]
    df = spark.createDataFrame(rows, ["k", "seq", "op", "price"])
    state: dict = {}
    for k, seq, op, v in rows:  # already in seq order
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    got = {r.k: r.price for r in apply_cdc_log(df, "k", "seq", "op").collect()}
    assert got == state, rows
