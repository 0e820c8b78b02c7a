"""Row-group footer census vs direct pyarrow ground truth."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from desdb_spark.operators.footer_census import diag_rowgroup_stats
from tests.conftest import SF_DIR


def test_rowgroup_census_matches_pyarrow(spark):
    rows = diag_rowgroup_stats(spark, SF_DIR).collect()
    root = f"{SF_DIR}/lineitem.parquet"
    files = (
        sorted(glob.glob(f"{root}/*.parquet"))
        if os.path.isdir(root)
        else sorted(glob.glob(root))
    )
    want = []
    for p in files:
        md = pq.ParquetFile(p).metadata
        ci = {md.schema.column(i).name: i for i in range(md.num_columns)}[
            "l_orderkey"
        ]
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            st = g.column(ci).statistics
            want.append(
                (
                    p.rsplit("/", 1)[-1],
                    rg,
                    g.num_rows,
                    g.total_byte_size,
                    int(st.min),
                    int(st.max),
                )
            )
    got = [
        (r.path, r.row_group, r.n_rows, r.total_bytes, r.orderkey_min, r.orderkey_max)
        for r in rows
    ]
    assert got == sorted(want)
    # census totals reconcile with the table
    from desdb_spark.session import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r.n_rows for r in rows) == li.count()
    lo, hi = li.selectExpr("min(l_orderkey)", "max(l_orderkey)").first()
    assert min(r.orderkey_min for r in rows) == lo
    assert max(r.orderkey_max for r in rows) == hi
