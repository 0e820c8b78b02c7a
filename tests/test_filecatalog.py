"""Custom Python DataSource: partitioned filesystem catalog with template
key extraction (the desdb file-location surface as a table)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from desdb_spark.sources.filecatalog import FileCatalogDataSource


def _tree(root: str) -> None:
    for run, exp, ccd in [("r1", "exp00000001", "01"), ("r1", "exp00000002", "02"),
                          ("r2", "exp00000003", "11")]:
        d = os.path.join(root, "des", "red", run, "red")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{exp}_{ccd}.fits.fz"), "wb") as fh:
            fh.write(b"z" * (64 + int(ccd)))
    with open(os.path.join(root, "README"), "w") as fh:
        fh.write("top-level file\n")


def test_filecatalog_source(spark):
    root = tempfile.mkdtemp(prefix="fc_root_")
    try:
        _tree(root)
        spark.dataSource.register(FileCatalogDataSource)
        df = (
            spark.read.format("filecatalog")
            .option("path", root)
            .option("template", "des/red/${run}/red/${expname}_${ccd}.fits.fz")
            .load()
        )
        rows = df.orderBy("path").collect()
        assert len(rows) == 4  # 3 catalog files + README
        fits = [r for r in rows if r.path.endswith(".fits.fz")]
        assert {(r.run, r.expname, r.ccd) for r in fits} == {
            ("r1", "exp00000001", "01"),
            ("r1", "exp00000002", "02"),
            ("r2", "exp00000003", "11"),
        }
        readme = [r for r in rows if r.path == "README"][0]
        assert readme.run is None and readme.size_bytes == 15
        # Queryable like any table: release-runs query (A5) over the fs.
        runs = (
            df.where(F.col("run").isNotNull())
            .select("run").distinct().orderBy("run").collect()
        )
        assert [r.run for r in runs] == ["r1", "r2"]
    finally:
        shutil.rmtree(root, ignore_errors=True)
