"""Round-7: distributed parquet row-group census — zone-map health at
the ROW-GROUP grain, where pruning actually happens. diag_file_layout
counts rows per file; whether a range scan can skip I/O depends on the
row-group min/max stats inside each footer. This op reads every footer
IN PARALLEL — binaryFile-style file listing, one pyarrow footer parse
per task via mapInPandas — and reports each row group's row count and
key range. At 100 TB this is how you audit a table's clusteredness
without scanning data: footers are KBs, and the census is
embarrassingly parallel over files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register


@register("diag_rowgroup_stats", group="footer_census")  # rows-only: fs layout
def diag_rowgroup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per row group of lineitem.parquet: rows, byte size, and the
    l_orderkey min/max from the footer statistics — the exact numbers a
    range predicate prunes against.

    Scale shape: the file list is a tiny driver-side frame; footer
    parsing fans out via ``mapInPandas`` (each task opens its files'
    FOOTERS only — pyarrow reads the metadata thrift, never the column
    data). Rows-only: footer layout is writer-specific; the census is
    pinned against pyarrow ground truth in tests/test_footer_census.py.
    """
    import glob
    import os

    # A directory-style table also matches the single-file glob, so
    # branch on isdir — pq.ParquetFile(<dir>) would raise otherwise.
    root = f"{sf_dir}/lineitem.parquet"
    files = (
        sorted(glob.glob(f"{root}/*.parquet"))
        if os.path.isdir(root)
        else sorted(glob.glob(root))
    )
    fdf = spark.createDataFrame([(p,) for p in files], "path string")

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = {
                "path": [],
                "row_group": [],
                "n_rows": [],
                "total_bytes": [],
                "orderkey_min": [],
                "orderkey_max": [],
            }
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                name_to_idx = {
                    md.schema.column(i).name: i for i in range(md.num_columns)
                }
                ci = name_to_idx["l_orderkey"]
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    col = g.column(ci)
                    st = col.statistics
                    out["path"].append(p.rsplit("/", 1)[-1])
                    out["row_group"].append(rg)
                    out["n_rows"].append(g.num_rows)
                    out["total_bytes"].append(g.total_byte_size)
                    out["orderkey_min"].append(
                        int(st.min) if st and st.has_min_max else None
                    )
                    out["orderkey_max"].append(
                        int(st.max) if st and st.has_min_max else None
                    )
            yield pd.DataFrame(out)

    return (
        fdf.repartition(max(1, len(files)))
        .mapInPandas(
            read_footers,
            schema="path string, row_group int, n_rows bigint, "
            "total_bytes bigint, orderkey_min bigint, orderkey_max bigint",
        )
        .orderBy("path", "row_group")
    )
