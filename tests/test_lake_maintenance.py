"""Maintenance structural pins: vacuum really deletes orphans and only
orphans; restore preserves history; a rejected WAP batch stages files
but never enters the manifest chain."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from desdb_spark.sources.lake_dml import build_merged_table
from desdb_spark.sources.lake_maintenance import (
    restore_version,
    vacuum,
    wap_commit,
)
from desdb_spark.sources.sinks import _stage_dir
from desdb_spark.sources.time_travel import read_as_of, read_manifest
from tests.conftest import SF_DIR


def test_vacuum_deletes_exactly_the_unreferenced_files(spark):
    root, _thr, n_total, n_touched = build_merged_table(
        spark, SF_DIR, root_name="dml_vacuum_orders"
    )
    deleted, retained = vacuum(root, keep_versions=[2])
    # Orphans = v1's rewritten-away (touched) files, nothing else.
    assert len(deleted) == n_touched
    assert all(not os.path.exists(p) for p in deleted)
    assert all(os.path.exists(p) for p in retained)
    # v2 still reads after the deletes.
    assert read_as_of(spark, root, 2).count() > 0


def test_restore_keeps_history_readable(spark):
    root, *_ = build_merged_table(spark, SF_DIR, root_name="dml_restore_orders")
    restore_version(root, 1, 3)
    v1 = read_as_of(spark, root, 1)
    v3 = read_as_of(spark, root, 3)
    assert v1.count() == v3.count()
    # The bad merge stays inspectable in history.
    assert read_as_of(spark, root, 2).count() > v1.count()


def test_rejected_wap_batch_never_enters_manifest_chain(spark):
    from desdb_spark.session import load_table
    from desdb_spark.sources.time_travel import write_version

    src = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("k"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _stage_dir(spark, "dml_wap_test")
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    write_version(src.limit(100), root, 1)
    # A batch duplicating main's keys must be rejected without a commit.
    assert wap_commit(spark, root, 1, src.orderBy("k").limit(5)) is False
    assert not os.path.exists(os.path.join(root, "manifest", "v2.json"))
    # The staged files exist on disk (vacuum's job), unreferenced.
    assert glob.glob(os.path.join(root, "data_v2", "*.parquet"))
    referenced = {
        e["path"] if isinstance(e, dict) else e for e in read_manifest(root, 1)
    }
    assert all("data_v2" not in p for p in referenced)

def test_cluster_rewrite_restores_disjoint_zone_maps(spark):
    from desdb_spark.sources.lake_maintenance import source_cluster_rewrite

    row = source_cluster_rewrite(spark, SF_DIR).collect()[0]
    root = _stage_dir(spark, "dml_optimize_orders")

    def ranges(version):
        return sorted(
            (int(e["min"]), int(e["max"]))
            for e in read_manifest(root, version)
            if isinstance(e, dict)
        )

    v3 = ranges(3)
    assert row["n_files"] == len(v3)
    # Post-OPTIMIZE files are pairwise range-disjoint (keys are unique,
    # so sorted ranges must be strictly increasing)...
    assert all(a[1] < b[0] for a, b in zip(v3, v3[1:]))
    # ...and the rewrite COMPACTED the DML-accumulated file count
    # (untouched + rewritten + insert files) back down to N_FILES.
    v2 = ranges(2)
    assert len(v2) > len(v3)
    # A probe over the first file's key range touches exactly that one
    # file — disjointness makes zone-map pruning exact again.
    lo, hi = v3[0]
    touched = sum(1 for a, b in v3 if a <= hi and b >= lo)
    assert touched == 1
