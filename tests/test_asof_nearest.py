"""Round-8e: nearest as-of properties — pandas.merge_asof parity at
sf0.001 (the public reference implementation of 'nearest' semantics,
per-user) plus the family consistency law: the nearest match is
whichever of the backward/forward matches has the smaller gap, ties
backward."""

from __future__ import annotations

import pandas as pd

from desdb_spark.operators.asof_nearest import join_asof_nearest
from desdb_spark.operators.asof_ext import join_asof_forward
from desdb_spark.session import load_table, normalize_events_ts
from tests.conftest import SF_DIR


def _frames(spark):
    ev = load_table(spark, SF_DIR, "events").toPandas()
    v = (
        ev[ev.event_type == "view"][["user_id", "ts"]]
        .rename(columns={"ts": "view_ts"})
        .sort_values(["view_ts", "user_id"])
        .reset_index(drop=True)
    )
    p = (
        ev[ev.event_type == "purchase"][["user_id", "ts"]]
        .rename(columns={"ts": "purchase_ts"})
        .sort_values(["purchase_ts", "user_id"])
        .reset_index(drop=True)
    )
    return v, p


def test_nearest_matches_pandas_merge_asof(spark):
    v, p = _frames(spark)
    expect = pd.merge_asof(
        v,
        p,
        left_on="view_ts",
        right_on="purchase_ts",
        by="user_id",
        direction="nearest",
    )
    got = join_asof_nearest(spark, SF_DIR).toPandas()
    key = lambda df: df.sort_values(
        ["user_id", "view_ts"]
    ).reset_index(drop=True)
    expect, got = key(expect), key(got)
    assert len(expect) == len(got)
    for e, g in zip(expect.itertuples(), got.itertuples()):
        assert (e.user_id, e.view_ts) == (g.user_id, g.view_ts)
        if pd.isna(e.purchase_ts):
            assert pd.isna(g.nearest_purchase_ts) and pd.isna(g.gap_us)
        else:
            assert g.nearest_purchase_ts == e.purchase_ts
            assert g.gap_us == abs(
                int(
                    (e.view_ts - e.purchase_ts) // pd.Timedelta(
                        microseconds=1
                    )
                )
            )


def test_nearest_consistent_with_forward_arm(spark):
    """Where the forward op found a next purchase, nearest's gap must be
    <= the forward gap (nearest optimizes over a superset)."""
    fwd = {
        (r.user_id, r.view_ts): r.next_purchase_ts
        for r in join_asof_forward(spark, SF_DIR).collect()
        if r.next_purchase_ts is not None
    }
    checked = 0
    for r in join_asof_nearest(spark, SF_DIR).collect():
        nxt = fwd.get((r.user_id, r.view_ts))
        if nxt is None:
            continue
        fwd_gap = (nxt - r.view_ts) // pd.Timedelta(microseconds=1)
        assert r.gap_us is not None and r.gap_us <= abs(fwd_gap)
        checked += 1
    assert checked > 0
