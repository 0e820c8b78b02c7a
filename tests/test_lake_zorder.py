"""Z-order manifest pins: the 2D probe's pruning ratio (what the value
hash can't carry — sampled curve boundaries are environment-dependent)
and both dimensions' bounds being present per file."""

from __future__ import annotations

from desdb_spark.sources.lake_zorder import (
    PROBE_CUSTKEY_MAX,
    PROBE_DATE_MIN,
    build_zordered_table,
    read_pruned_2d,
)
from desdb_spark.sources.time_travel import read_manifest
from tests.conftest import SF_DIR


def test_zorder_2d_probe_prunes_files(spark):
    root = build_zordered_table(spark, SF_DIR)
    entries = read_manifest(root, 1)
    # Every file carries bounds for BOTH clustering dimensions.
    assert all({"ck", "d"} <= set(e["stats"]) for e in entries)
    _df, n_total, n_scanned = read_pruned_2d(
        spark, root, PROBE_CUSTKEY_MAX, PROBE_DATE_MIN
    )
    # The 2D-selective probe reads a strict subset of the files — the
    # thing a 1D layout cannot give for the second dimension.
    assert 0 < n_scanned < n_total
    # Pruning must also beat either single dimension used alone.
    ck_only = sum(
        1 for e in entries if int(e["stats"]["ck"][0]) <= PROBE_CUSTKEY_MAX
    )
    d_only = sum(1 for e in entries if e["stats"]["d"][1] >= PROBE_DATE_MIN)
    assert n_scanned <= min(ck_only, d_only)