"""Snapshot diff, mergeSchema evolution read, and attribution: planted
mutations must be classified exactly; v1 rows must surface null-filled;
attribution credit must match a per-user replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.operators.reconcile import diff_snapshot_reconcile, snapshot_diff
from desdb_spark.session import load_table, normalize_events_ts
from desdb_spark.sources.schema_evolution import source_schema_evolution_merge
from tests.conftest import SF_DIR


def test_snapshot_diff_classifies_planted_mutations(spark):
    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z"), (4, "w")], ["k", "v"]
    )
    b = spark.createDataFrame(
        [(1, "x"), (2, "CHANGED"), (4, "w"), (9, "new")], ["k", "v"]
    )
    got = {r.k: r.status for r in snapshot_diff(a, b, "k", F.col("v")).collect()}
    assert got == {2: "changed", 3: "removed", 9: "added"}


def test_reconcile_counts_match_mutation_classes(spark):
    o = load_table(spark, SF_DIR, "orders")
    n = o.count()
    max_key = o.agg(F.max("o_orderkey")).first()[0]
    removed = o.where(F.col("o_orderkey") % 97 == 0).count()
    changed = o.where(F.col("o_orderkey") % 97 == 1).count()
    rows = {r.status: r for r in diff_snapshot_reconcile(spark, SF_DIR).collect()}
    assert rows["removed"].n_rows == removed
    assert rows["changed"].n_rows == changed
    assert rows["added"].n_rows == 5
    assert rows["added"].min_key == max_key + 1
    assert rows["added"].max_key == max_key + 5
    assert n > removed + changed  # unequal rows were actually dropped


def test_schema_evolution_null_fills_old_vintage(spark):
    rows = {r.vintage: r for r in source_schema_evolution_merge(spark, SF_DIR).collect()}
    assert set(rows) == {"v1", "v2"}
    assert rows["v1"].n_with_channel == 0  # old files: column null-filled
    assert rows["v2"].n_with_channel == rows["v2"].n_rows  # new files: populated
    o = load_table(spark, SF_DIR, "orders")
    assert rows["v1"].n_rows + rows["v2"].n_rows == o.count()


def test_last_touch_matches_per_user_replay(spark):
    from desdb_spark.extensions.attribution import (
        TOUCHES,
        events_attribution_last_touch,
    )

    ev = (
        normalize_events_ts(load_table(spark, SF_DIR, "events"))
        .where(F.col("event_type").isin(*TOUCHES, "purchase"))
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    want: dict = {}
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        last = None
        for r in rows:
            if r.event_type == "purchase":
                key = last or "__organic__"
                want[key] = want.get(key, 0) + 1
            else:
                last = r.event_type
    got = {
        r.credited_touch: r.n_purchases
        for r in events_attribution_last_touch(spark, SF_DIR).collect()
    }
    assert got == want
