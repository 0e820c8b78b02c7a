"""Forward as-of tie semantics (ADVICE r7 high): a purchase at EXACTLY
the view's timestamp must match — the oracle's ``p.ts >= v.ts`` includes
it, so the window ordering has to put views before purchases at equal ts
(the fixtures carry no (user, ts) ties, so only a planted tie exercises
this; a regression here flips the differential hash on any tied data).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd

from desdb_spark.operators.asof_ext import join_asof_forward


def _write_events(tmp_path, rows):
    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [dt.datetime(2024, 1, 1, 0, 0, s) for s, _, _ in rows],
            "user_id": [u for _, u, _ in rows],
            "event_type": [e for _, _, e in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


def test_equal_ts_purchase_matches(spark, tmp_path):
    sf_dir = _write_events(
        tmp_path,
        [
            # user 1: purchase at exactly the view ts — MUST match (tie)
            (10, 1, "view"),
            (10, 1, "purchase"),
            (20, 1, "purchase"),
            # user 2: only an earlier purchase — forward match is null
            (5, 2, "purchase"),
            (10, 2, "view"),
            # user 3: strictly later purchase
            (10, 3, "view"),
            (15, 3, "purchase"),
        ],
    )
    got = {
        r.user_id: (r.next_purchase_ts.second if r.next_purchase_ts else None)
        for r in join_asof_forward(spark, sf_dir).collect()
    }
    assert got == {1: 10, 2: None, 3: 15}
