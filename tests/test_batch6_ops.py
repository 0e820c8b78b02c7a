"""CDC apply, skyline, and BPE pairs: library-level semantics beyond the
differential hash — tombstone/update interleavings, prune-safety of the
two-phase skyline, and overlapping-bigram extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.extensions.skyline import skyline_2d
from desdb_spark.operators.cdc import apply_cdc_log
from tests.conftest import SF_DIR


def test_apply_cdc_log_latest_wins_and_tombstones(spark):
    log = spark.createDataFrame(
        [
            (1, 1, "I", 10.0),
            (1, 2, "U", 11.0),  # update wins
            (2, 1, "I", 20.0),
            (2, 2, "D", None),  # tombstoned
            (3, 1, "I", 30.0),
            (3, 2, "D", None),
            (3, 3, "I", 33.0),  # re-inserted after delete
            (4, 2, "U", 44.0),  # update with no insert still lands
        ],
        ["k", "seq", "op", "price"],
    )
    got = {r.k: r.price for r in apply_cdc_log(log, "k", "seq", "op").collect()}
    assert got == {1: 11.0, 3: 33.0, 4: 44.0}


def test_skyline_prune_never_drops_frontier_points(spark):
    # Brute-force frontier on a planted set, including dominated ties.
    pts = [(1, 1), (1, 5), (2, 7), (3, 7), (3, 3), (5, 9), (5, 2), (7, 9)]
    df = spark.createDataFrame(pts, ["cost", "benefit"])

    def dominated(p, qs):
        return any(
            (q[0] <= p[0] and q[1] >= p[1]) and (q[0] < p[0] or q[1] > p[1])
            for q in qs
        )

    want = sorted(p for p in set(pts) if not dominated(p, set(pts)))
    for n_buckets in (1, 2, 3, 8):
        got = sorted(
            (r.cost, r.benefit)
            for r in skyline_2d(df, "cost", "benefit", n_buckets).collect()
        )
        assert got == want, (n_buckets, got)


def test_skyline_points_are_mutually_nondominating(spark):
    from desdb_spark.extensions.skyline import analytics_skyline_2d

    rows = analytics_skyline_2d(spark, SF_DIR).collect()
    assert len(rows) >= 1
    # Along increasing price the date must strictly increase — the 2-D
    # frontier's staircase property.
    prices = [r.price for r in rows]
    dates = [r.odate for r in rows]
    assert prices == sorted(prices)
    assert all(d2 > d1 for d1, d2 in zip(dates, dates[1:]))


def test_bpe_pairs_match_python_count(spark):
    from desdb_spark.extensions.tokenizer_ext import text_bpe_pair_freq
    from desdb_spark.session import load_table

    texts = [
        r.text for r in load_table(spark, SF_DIR, "documents").select("text").collect()
    ]
    counts: dict = {}
    for t in texts:
        for w in t.split(" "):
            for i in range(len(w) - 1):
                p = w[i : i + 2]
                counts[p] = counts.get(p, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    got = [(r.pair, r.freq) for r in text_bpe_pair_freq(spark, SF_DIR).collect()]
    assert got == want
