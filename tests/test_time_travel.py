"""Manifest versioning semantics: snapshot isolation, append
completeness, and zone-map pruning effectiveness (the parts the
differential hash can't carry because sampled file boundaries are
environment-dependent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.session import load_table
from desdb_spark.sources.time_travel import (
    PIVOT_DATE,
    PRUNE_LO,
    read_as_of,
    read_pruned,
    source_manifest_pruned_read,
    source_time_travel_read,
    write_version,
)
from tests.conftest import SF_DIR


def test_snapshot_isolation_and_append_completeness(spark):
    rows = {r.version: r for r in source_time_travel_read(spark, SF_DIR).collect()}
    o = load_table(spark, SF_DIR, "orders")
    n_v1 = o.where(F.col("o_orderdate") < PIVOT_DATE).count()
    assert rows[1].n_rows == n_v1
    assert rows[2].n_rows == o.count()
    # the v1 manifest still reads the pre-append state AFTER v2 committed
    from desdb_spark.sources.time_travel import _table_root

    assert read_as_of(spark, _table_root(spark), 1).count() == n_v1


def test_manifest_pruning_skips_files_losslessly(spark):
    # run the op first so the clustered table + manifest exist
    (agg,) = source_manifest_pruned_read(spark, SF_DIR).collect()
    from desdb_spark.sources.sinks import _stage_dir

    root = _stage_dir(spark, "ttp_orders")
    df, total, scanned = read_pruned(spark, root, 1, PRUNE_LO)
    assert scanned < total  # pruning actually skipped files
    assert df.count() == agg.n_rows  # and lost nothing
    o = load_table(spark, SF_DIR, "orders")
    assert agg.n_rows == o.where(F.col("o_orderdate") >= PRUNE_LO).count()


def test_stats_manifest_records_minmax(spark, tmp_path):
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    entries = write_version(
        o.repartitionByRange(3, "o_orderdate"), str(tmp_path), 1,
        stats_col="o_orderdate",
    )
    assert all(e["min"] <= e["max"] for e in entries)
    lo = min(e["min"] for e in entries)
    hi = max(e["max"] for e in entries)
    got_lo, got_hi = o.agg(F.min("o_orderdate"), F.max("o_orderdate")).first()
    assert lo == str(got_lo) and hi == str(got_hi)
