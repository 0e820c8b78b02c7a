"""Property tests (hypothesis) for the join library helpers: asof_join
against a naive reference on random inputs, salted_join against the plain
join. Small example counts — each example runs real Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from desdb_spark.operators.joins import asof_join, salted_join

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# left rows: (grp, t); right rows keyed (grp, t) -> unique value so asof
# tie-breaking among equal (grp, t) right rows can't make the test flaky.
_left_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=1, max_size=8
)
_right_keys = st.dictionaries(
    st.tuples(st.integers(0, 2), st.integers(0, 20)),
    st.integers(0, 1000),
    min_size=1,
    max_size=8,
)


@given(left=_left_rows, right=_right_keys)
@_SETTINGS
def test_asof_backward_matches_reference(spark, left, right):
    ldf = spark.createDataFrame(
        [(g, t, i) for i, (g, t) in enumerate(left)], "grp bigint, t bigint, lid bigint"
    )
    rdf = spark.createDataFrame(
        [(g, t, v) for (g, t), v in right.items()], "grp bigint, t bigint, val bigint"
    )
    got = {
        r.lid: r.val
        for r in asof_join(ldf, rdf, on="t", by="grp", direction="backward").collect()
    }
    for i, (g, t) in enumerate(left):
        cands = [(rt, v) for (rg, rt), v in right.items() if rg == g and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, g, t, got[i], want)


@given(
    facts=st.lists(st.integers(0, 3), max_size=10),
    dims=st.dictionaries(st.integers(0, 3), st.integers(0, 99), max_size=4),
    salt=st.sampled_from([1, 3, 7]),
)
@_SETTINGS
def test_salted_join_equals_plain_join(spark, facts, dims, salt):
    f = spark.createDataFrame(
        [(k, i) for i, k in enumerate(facts)] or [(0, 0)], "k bigint, fid bigint"
    )
    d = spark.createDataFrame(list(dims.items()) or [(0, 0)], "k bigint, dv bigint")
    got = sorted(map(tuple, salted_join(f, d, "k", salt=salt).collect()))
    want = sorted(map(tuple, f.join(d, "k").collect()))
    assert got == want
