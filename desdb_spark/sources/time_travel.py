"""Round-8: manifest-based snapshot versioning with time-travel reads —
the core mechanism of every lakehouse table format (Delta/Iceberg/Hudi,
all public designs): a table version is a MANIFEST (a tiny JSON list of
immutable data files), an append commits new files plus a new manifest,
and "AS OF v" reads are simply "read the files v's manifest names".
Readers never list the directory — the manifest is the source of truth,
which is what makes concurrent appends and time travel safe on object
storage where listing is slow and eventually consistent.

Scale shape: data files are written executor-parallel and never
rewritten (append = new files + new manifest, exactly the format's
O(1)-metadata commit); a manifest is KBs regardless of table size; the
versioned read hands Spark an explicit file list, so planning cost is
proportional to the snapshot's file count, not the directory's history.

The op is hash-checked: both snapshots' aggregates must equal DuckDB
computing the same split directly from the source table — proving both
snapshot isolation (v1 is unaffected by the append) and the append's
completeness (v2 equals the full table).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: v1 = orders strictly before the pivot; the v2 append adds the rest.
PIVOT_DATE = "1998-01-01"


def _table_root(spark: SparkSession) -> str:
    from desdb_spark.sources.sinks import _stage_dir

    return _stage_dir(spark, "tt_orders")


def write_version(df: DataFrame, root: str, version: int) -> list[str]:
    """Append ``df`` as a new snapshot: write immutable data files under
    data/v{n}-*, then commit manifest/v{n}.json = prior files + new
    files. Returns the committed file list."""
    out = os.path.join(root, f"data_v{version}")
    df.write.mode("overwrite").parquet(out)
    files = sorted(glob.glob(os.path.join(out, "*.parquet")))
    prior: list[str] = []
    if version > 1:
        with open(os.path.join(root, "manifest", f"v{version - 1}.json")) as fh:
            prior = json.load(fh)["files"]
    os.makedirs(os.path.join(root, "manifest"), exist_ok=True)
    manifest = {"version": version, "files": prior + files}
    with open(os.path.join(root, "manifest", f"v{version}.json"), "w") as fh:
        json.dump(manifest, fh)
    return manifest["files"]


def read_as_of(spark: SparkSession, root: str, version: int) -> DataFrame:
    """Time-travel read: the file list comes from the manifest, never
    from a directory listing."""
    with open(os.path.join(root, "manifest", f"v{version}.json")) as fh:
        files = json.load(fh)["files"]
    return spark.read.parquet(*files)


@register(
    "source_time_travel_read",
    oracle=f"""
        SELECT 1 AS version,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               max(o_orderdate) AS max_date
        FROM orders WHERE o_orderdate < DATE '{PIVOT_DATE}'
        UNION ALL
        SELECT 2,
               CAST(count(*) AS BIGINT),
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT),
               max(o_orderdate)
        FROM orders
    """,
    group="time_travel",
)
def source_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a two-version manifest table (v1 = pre-pivot orders, v2 =
    v1 + the append of the rest), then time-travel read BOTH versions
    and aggregate each — hashed against DuckDB splitting the source
    directly, so v1's isolation from the append and v2's completeness
    are both inside the differential gate.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    root = _table_root(spark)
    write_version(o.where(F.col("o_orderdate") < PIVOT_DATE), root, 1)
    write_version(o.where(F.col("o_orderdate") >= PIVOT_DATE), root, 2)

    def snap_agg(version: int) -> DataFrame:
        return read_as_of(spark, root, version).agg(
            F.lit(version).alias("version"),
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("sum_cents"),
            F.max("o_orderdate").alias("max_date"),
        )

    return snap_agg(1).unionByName(snap_agg(2))
