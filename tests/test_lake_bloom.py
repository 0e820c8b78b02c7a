"""Bloom-index semantics (the hash proves the lookup answer; this pins
that pruning actually happens and that zone maps could not have done
it)."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from desdb_spark.session import load_table
from desdb_spark.sources.lake_bloom import (
    N_FILES,
    PROBE_MOD,
    PROBE_RES,
    build_bloom_table,
    read_bloom_pruned,
)
from tests.conftest import SF_DIR


def _probe_keys(spark):
    return [
        r.k
        for r in load_table(spark, SF_DIR, "orders")
        .select(F.col("o_orderkey").cast("bigint").alias("k"))
        .where(F.col("k") % PROBE_MOD == PROBE_RES)
        .collect()
    ]


def test_bloom_prunes_where_zone_maps_cannot(spark):
    root, m = build_bloom_table(spark, SF_DIR)
    keys = _probe_keys(spark)
    df, n_total, n_scanned = read_bloom_pruned(spark, root, m, keys)
    assert n_total == N_FILES
    # the bloom must skip files (custkey clustering scatters few probe
    # keys across few files; fpp ~1%)
    assert n_scanned < n_total
    # zone maps on the SAME column would keep every file: each file's
    # [min, max] orderkey span contains at least one probe key
    from desdb_spark.sources.time_travel import read_manifest

    zonemap_kept = 0
    for e in read_manifest(root, 1):
        md = pq.ParquetFile(e["path"]).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = min(
            md.row_group(g).column(idx["k"]).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx["k"]).statistics.max
            for g in range(md.num_row_groups)
        )
        if any(lo <= k <= hi for k in keys):
            zonemap_kept += 1
    assert zonemap_kept == n_total  # zone maps prune nothing here
    assert n_scanned < zonemap_kept


def test_no_false_negatives(spark):
    """Rows through the pruned read equal the direct filter — the bloom
    may over-read, never under-read."""
    root, m = build_bloom_table(spark, SF_DIR)
    keys = _probe_keys(spark)
    df, _, _ = read_bloom_pruned(spark, root, m, keys)
    direct = (
        load_table(spark, SF_DIR, "orders")
        .where(F.col("o_orderkey") % PROBE_MOD == PROBE_RES)
        .count()
    )
    assert df.count() == direct == len(keys)


def test_missing_key_skips_everything_or_fp_bound(spark):
    """A key absent from the table fires at most a false-positive-rate
    worth of files (allow 2 of 8 for slack at tiny m)."""
    root, m = build_bloom_table(spark, SF_DIR)
    _, n_total, n_scanned = read_bloom_pruned(
        spark, root, m, [10**12 + 7]
    )
    assert n_scanned <= max(1, n_total // 4)
