"""Planted-stream semantics for the streaming windowed top-k: window
assignment boundaries, the top-3 cut with its (count desc, user asc)
tie-break, and displacement of a below-cut user."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

from desdb_spark.streaming import windowed_topk as wt
from tests.conftest import SF_DIR


def test_windowed_topk_planted_stream(spark):
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(eid, minute, user, value=1.0):
        return (eid, base + dt.timedelta(minutes=minute), user, "view", value, "{}")

    rows = (
        # Hour 10: user 1 x3, user 2 x2, users 3,4 x1 each — top3 = 1,2,3
        # (3 beats 4 on the user_id tie-break at equal counts).
        [ev(1, 1, 1), ev(2, 2, 1), ev(3, 3, 1)]
        + [ev(4, 4, 2), ev(5, 5, 2)]
        + [ev(6, 6, 3), ev(7, 7, 4)]
        # Hour 11 (minute 60 is the boundary — belongs to hour 11):
        # user 4 x2, user 9 x1 → top3 = 4, 9.
        + [ev(8, 60, 4), ev(9, 61, 4), ev(10, 62, 9)]
    )
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    stage = tempfile.mkdtemp(prefix="desdb_wtopk_test_")
    try:
        # The op expects {sf_dir}/events.parquet to be a FILE (the
        # fixture layout; the streaming stager symlinks it) — write to a
        # scratch dir and move the single part file into place.
        scratch = os.path.join(stage, "_write")
        df.coalesce(1).write.parquet(scratch)
        part = next(
            f for f in os.listdir(scratch) if f.endswith(".parquet")
        )
        os.rename(
            os.path.join(scratch, part), os.path.join(stage, "events.parquet")
        )
        got = wt.stream_windowed_topk_users(spark, stage).collect()
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    by_win: dict = {}
    for r in got:
        by_win.setdefault(r.win_start.hour, []).append((r.user_id, r.n_events))
    assert sorted(by_win[10]) == [(1, 3), (2, 2), (3, 1)], by_win
    assert sorted(by_win[11]) == [(4, 2), (9, 1)], by_win
    # user 4's hour-10 event must not leak into hour 11's count, and the
    # minute-60 boundary row must not land in hour 10.
    assert (4, 1) not in by_win.get(11, [])
    assert all(u != 9 for u, _ in by_win[10])
