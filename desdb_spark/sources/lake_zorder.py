"""Round-8: Z-ordered manifest table with TWO-dimension zone-map
pruning — the end-to-end form of OPTIMIZE ZORDER: layout_ext.py proves
the Morton layout narrows per-file ranges on both dimensions; this op
commits that layout to the manifest with per-file (custkey, date)
bounds and answers a 2D-selective query reading ONLY the files whose
rectangle overlaps the probe — then re-filters exactly, so pruning is
lossless by construction and the differential hash proves it.

Why this matters at 100 TB: a 1D-clustered table prunes one predicate
and scans full-width on every other column; the Z-order rectangle
bounds BOTH, so a (customer AND date) probe touches ~selectivity_a ×
selectivity_b of the files instead of min(selectivity_a, 1). The
pruning decision itself reads KBs of manifest, zero footers, zero
listings (same lever as source_manifest_pruned_read, now in 2D).

The probe constants are absolute (custkey ≤ 300, date ≥ 1997-06-01) so
the oracle is one literal WHERE clause; selectivity varies with SF but
losslessness — the hashed property — does not. The pruning RATIO at
fixture scale is pinned in tests/test_lake_zorder.py (sampled range
boundaries are environment-dependent, so the ratio has no place in a
value hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table
from desdb_spark.sources.layout_ext import morton_key, scale_to_16bit
from desdb_spark.sources.sinks import _stage_dir
from desdb_spark.sources.time_travel import (
    commit_manifest,
    read_manifest,
    write_data_files,
)

#: 2D probe: low-custkey customers since mid-1997.
PROBE_CUSTKEY_MAX = 300
PROBE_DATE_MIN = "1997-06-01"
#: Z-ordered file count for the staged table.
N_ZFILES = 8


def build_zordered_table(spark: SparkSession, sf_dir: str) -> str:
    """orders Z-ordered on (o_custkey, date) into N_ZFILES files, with
    per-file bounds for BOTH dimensions in the manifest. Returns root."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("k"),
        F.col("o_custkey").cast("bigint").alias("ck"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
        .cast("bigint")
        .alias("dd"),
    )
    # Dimension bounds: the same tiny stats lookup any layout optimizer
    # does before a rewrite (driver-side 1-row collect).
    lo_ck, hi_ck, lo_dd, hi_dd = o.agg(
        F.min("ck"), F.max("ck"), F.min("dd"), F.max("dd")
    ).collect()[0]
    z = morton_key(
        scale_to_16bit(F.col("ck"), lo_ck, hi_ck),
        scale_to_16bit(F.col("dd"), lo_dd, hi_dd),
    )
    root = _stage_dir(spark, "dml_zorder_orders")
    clustered = (
        o.withColumn("z", z)
        .repartitionByRange(N_ZFILES, "z")
        .sortWithinPartitions("z")
        .drop("z", "dd")
    )
    entries = write_data_files(clustered, root, 1, stats_col=["ck", "d"])
    commit_manifest(root, 1, entries)
    return root


def read_pruned_2d(
    spark: SparkSession, root: str, ck_max: int, d_min: str
):
    """Read only files whose (ck, d) rectangle overlaps the probe, then
    re-filter exactly. Returns (DataFrame, n_total, n_scanned)."""
    entries = read_manifest(root, 1)
    keep = [
        e["path"]
        for e in entries
        if int(e["stats"]["ck"][0]) <= ck_max and e["stats"]["d"][1] >= d_min
    ]
    from desdb_spark.sources.lake_dml import read_or_empty

    df = read_or_empty(
        spark, keep, schema="k bigint, ck bigint, cents bigint, d date"
    ).where((F.col("ck") <= ck_max) & (F.col("d") >= d_min))
    return df, len(entries), len(keep)


@register(
    "source_zorder_pruned_read_2d",
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               CAST(min(o_custkey) AS BIGINT) AS min_ck,
               max(o_orderdate) AS max_date
        FROM orders
        WHERE o_custkey <= {PROBE_CUSTKEY_MAX}
          AND o_orderdate >= DATE '{PROBE_DATE_MIN}'
    """,
    group="lake_zorder",
)
def source_zorder_pruned_read_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER end to end: write orders Morton-ordered on
    (custkey, date) with both dimensions' per-file bounds in the
    manifest, answer a 2D probe reading only rectangle-overlapping
    files, and aggregate — hashed against DuckDB filtering the source
    directly, so 2D pruning must be lossless whatever rectangles the
    sampled curve boundaries produced.
    """
    root = build_zordered_table(spark, sf_dir)
    df, _total, _scanned = read_pruned_2d(
        spark, root, PROBE_CUSTKEY_MAX, PROBE_DATE_MIN
    )
    return df.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.min("ck").cast("bigint").alias("min_ck"),
        F.max("d").alias("max_date"),
    )
