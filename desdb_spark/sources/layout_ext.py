"""Round-6 batch-4 multi-dimensional clustering layout (Z-order).

``sink_sorted_parquet`` (sources/sinks.py) already demonstrates
single-column range layout: sort by one key and parquet row-group min/max
stats prune scans on that key. But a 100 TB fact table is queried on
MORE than one dimension (customer AND date, part AND supplier), and a
linear sort can only serve one of them — the second dimension's min/max
ranges stay full-width in every file. The classic fix is a space-filling
curve: interleave the bits of both keys (Morton/Z-order, public
literature — Morton 1966; the layout behind Delta Lake's OPTIMIZE ZORDER
and the Hudi/Iceberg equivalents) and range-partition by the interleaved
key, so every output file covers a bounded rectangle in (dim1, dim2) and
predicates on EITHER dimension skip most files.

Two design points that are scale decisions, not details:

- **Normalize before interleaving.** Interleaving raw values lets the
  wider-ranged column's high bits dominate the curve (an 11-bit partkey
  over a 7-bit suppkey degenerates to a plain partkey sort). Each
  column is first scaled to the full 16-bit range from its min/max —
  at cluster scale those two scalars come from catalog/file-footer
  statistics, i.e. free; here they are one tiny driver-side aggregate,
  the same stats lookup any layout optimizer performs before rewriting
  a table.
- **Pure codegen arithmetic.** The spread/interleave is shifts/AND/OR
  (whole-stage codegen, no UDF), so the registered op is hash-checkable:
  DuckDB runs the identical formula, min/max included, and floor-of-
  double scaling is correctly-rounded IEEE on both engines.

The write side (range-partition by zkey, sortWithinPartitions, write)
is ``zorder_layout``; tests/test_layout_ext.py writes real files and
asserts the dual-dimension min/max narrowing against a naive
single-sort layout.

Reference parity: desdb had no storage-layout surface (SURVEY.md §2A —
reconstructed); new engine capability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Magic-number bit-spreading constants: spread a 16-bit int so its bits
#: occupy the even positions of a 32-bit int (classic bit-interleave
#: folklore, public domain).
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` into the even bit positions."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def scale_to_16bit(col: Column, lo: int, hi: int) -> Column:
    """Scale an integer column with known [lo, hi] bounds onto 0..65535.
    floor((x-lo)·65535/span) in double — exact multiply (< 2^53) and
    correctly-rounded division, so bit-identical across engines."""
    span = max(hi - lo, 1)
    return F.floor(
        (col - F.lit(lo)).cast("double") * F.lit(65535.0) / F.lit(float(span))
    ).cast("bigint")


def morton_key(a: Column, b: Column) -> Column:
    """Interleave two 16-bit-clamped columns into one 32-bit Z-order key
    (``a`` on even bits, ``b`` on odd)."""
    return _spread_bits(a).bitwiseOR(F.shiftleft(_spread_bits(b), 1))


def zorder_layout(df: DataFrame, a: str, b: str, n_files: int) -> DataFrame:
    """Range-partition ``df`` by the normalized Morton key of (a, b) into
    ``n_files`` partitions and sort within each — the write-side recipe:
    follow with ``.write.parquet(...)`` and every file's (a, b) min/max
    stats cover a bounded rectangle. One stats lookup (two scalars per
    column — from catalog stats at scale) plus one range shuffle,
    identical cost to a plain global sort."""
    bounds = df.agg(
        F.min(a).alias("alo"), F.max(a).alias("ahi"),
        F.min(b).alias("blo"), F.max(b).alias("bhi"),
    ).first()
    keyed = df.withColumn(
        "_zkey",
        morton_key(
            scale_to_16bit(F.col(a), bounds["alo"], bounds["ahi"]),
            scale_to_16bit(F.col(b), bounds["blo"], bounds["bhi"]),
        ),
    )
    return (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )


# The oracle mirrors the normalization + spreading arithmetic exactly;
# BIGINT shifts keep every intermediate well under 64 bits.
_ORACLE = """
    WITH bounds AS (
        SELECT min(l_partkey) AS alo,
               greatest(max(l_partkey) - min(l_partkey), 1) AS aspan,
               min(l_suppkey) AS blo,
               greatest(max(l_suppkey) - min(l_suppkey), 1) AS bspan
        FROM lineitem
    ), norm AS (
        SELECT l_partkey, l_suppkey,
               CAST(floor((l_partkey - alo) * 65535.0 / aspan) AS BIGINT) AS na,
               CAST(floor((l_suppkey - blo) * 65535.0 / bspan) AS BIGINT) AS nb
        FROM lineitem, bounds
    ), s1 AS (
        SELECT l_partkey, l_suppkey,
               ((na & 65535) | ((na & 65535) << 8)) & 16711935 AS x1,
               ((nb & 65535) | ((nb & 65535) << 8)) & 16711935 AS y1
        FROM norm
    ), s2 AS (
        SELECT *, (x1 | (x1 << 4)) & 252645135 AS x2,
                  (y1 | (y1 << 4)) & 252645135 AS y2
        FROM s1
    ), s3 AS (
        SELECT *, (x2 | (x2 << 2)) & 858993459 AS x3,
                  (y2 | (y2 << 2)) & 858993459 AS y3
        FROM s2
    ), keyed AS (
        SELECT l_partkey, l_suppkey,
               ((x3 | (x3 << 1)) & 1431655765)
               | (((y3 | (y3 << 1)) & 1431655765) << 1) AS zkey
        FROM s3
    ), bucketed AS (
        SELECT *, zkey >> 26 AS bucket FROM keyed
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(l_partkey) AS part_min, max(l_partkey) AS part_max,
           min(l_suppkey) AS supp_min, max(l_suppkey) AS supp_max
    FROM bucketed GROUP BY bucket
"""


@register("layout_zorder_stats", oracle=_ORACLE, group="layout_ext")
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit of lineitem on (l_partkey, l_suppkey):
    normalize both keys to 16 bits from their min/max, interleave into
    the 32-bit Morton key, bucket by its top 6 bits (64 buckets = an
    8×8 grid over the two dimensions = the file grain), and report each
    bucket's row count and per-dimension min/max — the rectangles a
    z-ordered file layout would expose to parquet data skipping. Narrow
    rectangles in BOTH columns (vs a sort by l_partkey alone, which
    leaves l_suppkey full-width) are the whole point;
    tests/test_layout_ext.py pins that property on real written files.

    Scale shape: one stats lookup (two scalars per column — catalog
    stats at scale, one tiny aggregate here), one scan of pure codegen
    arithmetic, one partial-agg groupBy on the bucket id — shuffles 6
    numbers per bucket. The write path (``zorder_layout``) adds exactly
    one range-shuffle, same as any global sort."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    b = li.agg(
        F.min("l_partkey").alias("alo"), F.max("l_partkey").alias("ahi"),
        F.min("l_suppkey").alias("blo"), F.max("l_suppkey").alias("bhi"),
    ).first()
    keyed = li.select(
        "l_partkey",
        "l_suppkey",
        morton_key(
            scale_to_16bit(F.col("l_partkey"), b["alo"], b["ahi"]),
            scale_to_16bit(F.col("l_suppkey"), b["blo"], b["bhi"]),
        ).alias("zkey"),
    )
    bucketed = keyed.withColumn("bucket", F.shiftright(F.col("zkey"), 26))
    return bucketed.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("l_partkey").alias("part_min"),
        F.max("l_partkey").alias("part_max"),
        F.min("l_suppkey").alias("supp_min"),
        F.max("l_suppkey").alias("supp_max"),
    )
