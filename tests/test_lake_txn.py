"""Txn-log structural pins: the pointer is the only publisher — a stray
per-table manifest written after the last txn changes nothing a txn
reader observes (crash-orphan safety), and snapshot pairs are
referentially consistent (no orphan lines)."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.sources.lake_txn import (
    build_txn_tables,
    get_txn,
    latest_txn,
    read_txn_table,
)
from tests.conftest import SF_DIR


def test_stray_manifest_never_published(spark):
    import os

    from desdb_spark.sources.time_travel import write_version

    root = build_txn_tables(spark, SF_DIR)
    txn_before = latest_txn(root)
    li_before = read_txn_table(spark, root, txn_before, "lineitem").count()
    # Simulate a crashed writer: orders v3 manifest lands, txn pointer
    # never advances.
    stray = read_txn_table(spark, root, txn_before, "orders").limit(10)
    write_version(stray, os.path.join(root, "orders"), 3)
    txn_after = latest_txn(root)
    assert txn_after == txn_before
    assert (
        read_txn_table(spark, root, txn_after, "lineitem").count() == li_before
    )
    assert txn_after["versions"] == {"orders": 2, "lineitem": 2}


def test_txn_pairs_referentially_consistent(spark):
    root = build_txn_tables(spark, SF_DIR)
    for txn_id in (1, 2):
        txn = get_txn(root, txn_id)
        o = read_txn_table(spark, root, txn, "orders").select("k")
        li = read_txn_table(spark, root, txn, "lineitem").select("k")
        orphans = li.join(F.broadcast(o), on="k", how="left_anti").count()
        assert orphans == 0