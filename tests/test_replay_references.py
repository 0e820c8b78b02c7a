"""Replay references for the remaining shared-formulation operators:
ordered funnel, basket lift, Markov entropy rate, and the sweep-line
concurrency curve — each checked against a plain-Python recomputation
on the real fixture (the differential hash proves Spark == DuckDB;
these prove the shared formulation == the intended semantics)."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from desdb_spark.session import load_table, normalize_events_ts
from tests.conftest import SF_DIR


def _events(spark):
    return (
        normalize_events_ts(load_table(spark, SF_DIR, "events"))
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )


def test_ordered_funnel_matches_replay(spark):
    from desdb_spark.extensions.funnel_ext import (
        BUDGET_HOURS,
        STEPS,
        events_funnel_ordered,
    )

    by_user = defaultdict(list)
    for r in _events(spark):
        by_user[r.user_id].append(r)
    budget = BUDGET_HOURS * 3600
    reached = [0, 0, 0]
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        t_prev = None
        for step_i, step in enumerate(STEPS):
            nxt = None
            for r in rows:
                if r.event_type != step:
                    continue
                if step_i == 0:
                    nxt = r.ts
                    break
                if t_prev is not None and (
                    r.ts > t_prev
                    and (r.ts - t_prev).total_seconds() <= budget
                ):
                    nxt = r.ts
                    break
            if nxt is None:
                break
            reached[step_i] += 1
            t_prev = nxt
    got = {r.step: r.n_users for r in events_funnel_ordered(spark, SF_DIR).collect()}
    assert got == {1: reached[0], 2: reached[1], 3: reached[2]}, (got, reached)


def test_basket_lift_matches_replay(spark):
    from desdb_spark.extensions.analytics_ext3 import (
        MIN_SUPPORT,
        analytics_basket_lift,
    )

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct().collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    item = defaultdict(int)
    pair = defaultdict(int)
    for parts in baskets.values():
        ps = sorted(parts)
        for p in ps:
            item[p] += 1
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair[(ps[i], ps[j])] += 1
    n_orders = len(baskets)
    scored = [
        (
            round(c * n_orders / (item[x] * item[y]), 4),
            x,
            y,
            c,
        )
        for (x, y), c in pair.items()
        if c >= MIN_SUPPORT
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = [(x, y, c, lift) for lift, x, y, c in scored[:25]]
    got = [
        (r.x, r.y, r.pair_supp, r.lift)
        for r in analytics_basket_lift(spark, SF_DIR).collect()
    ]
    assert got == want


def test_markov_entropy_rate_matches_replay(spark):
    from desdb_spark.extensions.markov_ext import events_markov_entropy_rate

    by_user = defaultdict(list)
    for r in _events(spark):
        by_user[r.user_id].append(r)
    trans = defaultdict(int)
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        for a, b in zip(rows, rows[1:]):
            trans[(a.event_type, b.event_type)] += 1
    row_n = defaultdict(int)
    for (s, _), n in trans.items():
        row_n[s] += n
    total = sum(trans.values())
    h_cond = {}
    for s in row_n:
        h = 0.0
        for (a, b), n in trans.items():
            if a == s:
                p = n / row_n[s]
                h -= p * math.log2(p)
        h_cond[s] = h
    rate = sum(row_n[s] / total * h_cond[s] for s in row_n)
    rows = events_markov_entropy_rate(spark, SF_DIR).collect()
    for r in rows:
        assert r.n_transitions == row_n[r.state]
        assert abs(r.h_conditional_bits - round(h_cond[r.state], 4)) <= 1e-4
        assert abs(r.h_rate_bits - round(rate, 4)) <= 1e-4


def test_concurrency_curve_matches_replay(spark):
    from desdb_spark.extensions.sweepline_ext import events_concurrency_curve

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect()
    orders = {
        r.o_orderkey: r.o_orderdate
        for r in load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderdate")
        .collect()
    }
    deltas = defaultdict(int)
    for r in li:
        deltas[orders[r.l_orderkey]] += 1
        deltas[r.l_shipdate] -= 1
    running, curve = 0, {}
    for d in sorted(deltas):
        running += deltas[d]
        curve[d] = (deltas[d], running)
    want = sorted(
        ((v[1], d) for d, v in curve.items()), key=lambda t: (-t[0], t[1])
    )[:30]
    got = [(r.in_flight, r.d) for r in events_concurrency_curve(spark, SF_DIR).collect()]
    assert got == want
