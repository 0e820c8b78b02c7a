"""Structural lake-DML claims the differential value hash cannot carry:
copy-on-write rewrite targeting (untouched files survive by path), and
deletion-vector commits writing no data files.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from desdb_spark.session import load_table
from desdb_spark.sources.lake_dml import (
    DEL_MOD,
    KEY_SHIFT,
    UPD_MOD,
    build_merged_table,
    source_delete_vectors_read,
)
from desdb_spark.sources.time_travel import read_manifest
from tests.conftest import SF_DIR


def test_merge_copy_on_write_targets_touched_files_only(spark):
    root, thr, n_total, n_touched = build_merged_table(spark, SF_DIR)
    # The update batch is range-local (lowest key quarter), so zone-map
    # targeting must leave upper-range files untouched.
    assert 0 < n_touched < n_total
    v1 = {e["path"] for e in read_manifest(root, 1)}
    v2 = {e["path"] for e in read_manifest(root, 2)}
    carried = v1 & v2
    # Untouched v1 files are carried into v2 VERBATIM (same paths — zero
    # bytes rewritten), and exactly the touched ones are replaced.
    assert len(carried) == n_total - n_touched
    # Every replacement/insert file belongs to the v2 write, and the v2
    # manifest never references a removed v1 file.
    for p in v2 - v1:
        assert os.path.basename(os.path.dirname(p)) == "data_v2"


def test_merge_batch_nonempty_both_kinds(spark):
    root, thr, _total, _touched = build_merged_table(spark, SF_DIR)
    from desdb_spark.sources.time_travel import read_as_of

    v2 = read_as_of(spark, root, 2)
    n_upd = v2.where(
        (F.col("k") % UPD_MOD == 0) & (F.col("k") <= thr) & (F.col("k") < KEY_SHIFT)
    ).count()
    n_ins = v2.where(F.col("k") >= KEY_SHIFT).count()
    assert n_upd > 0 and n_ins > 0


def test_delete_vector_commit_writes_no_data_files(spark):
    from desdb_spark.sources.sinks import _stage_dir

    df = source_delete_vectors_read(spark, SF_DIR)
    row = df.collect()[0]
    root = _stage_dir(spark, "dml_dv_orders")
    # The delete committed ONLY the vector: one dv dir, one data dir.
    assert sorted(
        os.path.basename(d)
        for d in glob.glob(os.path.join(root, "*"))
        if os.path.isdir(d)
    ) == ["data_v1", "dv_v2", "manifest"]
    # The vector's cardinality equals the predicate's row count.
    n_deleted = (
        load_table(spark, SF_DIR, "orders")
        .where(F.col("o_orderkey") % DEL_MOD == 0)
        .count()
    )
    dv_rows = spark.read.parquet(os.path.join(root, "dv_v2")).count()
    assert dv_rows == n_deleted
    n_total = load_table(spark, SF_DIR, "orders").count()
    assert row["n_rows"] == n_total - n_deleted
