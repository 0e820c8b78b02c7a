"""Round-8d: partition-evolution pruning facts — which files each
spec's translation keeps (layout facts the value hash can't carry), and
losslessness: the pruned read equals the unpruned full scan."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from desdb_spark.sources.lake_partition_evo import (
    QUERY_HI,
    QUERY_LO,
    commit_evolved_table,
    prune_entries,
    source_partition_evolution_read,
)
from tests.conftest import SF_DIR


def _entries(spark):
    root = commit_evolved_table(spark, SF_DIR)
    with open(os.path.join(root, "manifest", "v2.json")) as fh:
        return json.load(fh)["files"]


def test_each_spec_prunes_under_its_own_rule(spark):
    entries = _entries(spark)
    kept = prune_entries(entries, QUERY_LO, QUERY_HI)
    kept1 = [e["part"] for e in kept if e["spec"] == 1]
    kept2 = [e["part"] for e in kept if e["spec"] == 2]
    # era 1 (years 1992..1997) degrades to year grain: only 1997 overlaps
    assert kept1 and all(p["p_year"] == 1997 for p in kept1)
    # era 2 prunes to the exact months inside [1997-10-01, 1998-03-01)
    assert kept2
    assert {(p["p_year"], p["p_month"]) for p in kept2} == {
        (1998, 1),
        (1998, 2),
    }
    # evolution must actually skip files in BOTH eras
    n1 = sum(1 for e in entries if e["spec"] == 1)
    n2 = sum(1 for e in entries if e["spec"] == 2)
    assert len(kept1) < n1 and len(kept2) < n2


def test_pruned_read_is_lossless(spark):
    entries = _entries(spark)
    pred = (F.col("o_orderdate") >= QUERY_LO) & (
        F.col("o_orderdate") < QUERY_HI
    )
    full = (
        spark.read.parquet(*[e["path"] for e in entries])
        .where(pred)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0)).alias("cents"),
        )
        .collect()[0]
    )
    got = source_partition_evolution_read(spark, SF_DIR).collect()[0]
    assert got.n_rows == full.n
    assert got.sum_cents == int(full.cents)
    assert got.n_rows_era1 > 0 and got.n_rows_era2 > 0
    assert got.n_rows == got.n_rows_era1 + got.n_rows_era2
