"""Lake layout: partitioned & bucketed tables, CBO statistics (SURVEY.md §4).

The reference leaned on Oracle's server-side partitioning and optimizer
stats; the engine's equivalents are:

- **Date-partitioned writes** → static + dynamic partition pruning: a
  filter on the partition column prunes directories before any I/O. At
  100 TB this is the difference between scanning a day and scanning a
  decade.
- **Bucketed tables** → co-located joins: two tables bucketed on the same
  key join with *zero* shuffle (asserted in tests/test_lake.py). This is
  the pre-shuffle investment for every hot join key (orderkey, custkey).
- **Table statistics** → CBO join reordering + broadcast selection
  (`spark.sql.cbo.enabled`); collect after load, refresh after append.

Bucketed tables require the session catalog (``saveAsTable``); plain
partitioned writes work path-based.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_date(
    df: DataFrame,
    path: str,
    ts_col: str,
    granularity: str = "month",
    mode: str = "overwrite",
) -> DataFrame:
    """Write parquet partitioned by a derived date column; returns a reader.

    The partition column is *added*, not replacing ts_col, so queries keep
    full timestamp precision while scans prune on the directory key.
    """
    part_col = f"{ts_col}_{granularity}"
    out = df.withColumn(
        part_col, F.date_format(F.date_trunc(granularity, F.col(ts_col)), "yyyy-MM-dd")
    )
    out.write.mode(mode).partitionBy(part_col).parquet(path)
    return df.sparkSession.read.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist as a bucketed (+optionally sorted) catalog table.

    Joins between tables bucketed identically on the join key skip the
    shuffle entirely; sorting within buckets additionally skips the
    sort-merge sort.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)
    return df.sparkSession.table(table)


def analyze_table(spark: SparkSession, table: str, columns: list[str] | None = None) -> None:
    """Collect CBO statistics (row counts + per-column NDV/min/max)."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")
