"""Round-7: keyset (cursor) pagination — the scale-correct page fetch.

The LIMIT/OFFSET pagination already registered
(operators/relational_ext.py) is the API-parity shape, but OFFSET n
scans-and-discards n rows on every page — O(pages²) total work, the
classic deep-pagination trap. Keyset pagination seeks PAST the last row
of the previous page with a sargable compound predicate, so every page
costs one pruned scan + one top-k, independent of page depth. This is
how any production exporter walks a 100 TB table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Fixed cursor = the (o_orderdate, o_orderkey) of "the last row of the
#: previous page" — deterministic mid-fixture literals.
CURSOR_DATE = "1998-01-01 00:00:00"
CURSOR_KEY = 500
PAGE_SIZE = 100


@register(
    "scan_keyset_pagination",
    oracle=f"""
        SELECT o_orderkey, o_orderdate, o_orderstatus,
               round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_orderdate > TIMESTAMP '{CURSOR_DATE}'
           OR (o_orderdate = TIMESTAMP '{CURSOR_DATE}'
               AND o_orderkey > {CURSOR_KEY})
        ORDER BY o_orderdate, o_orderkey
        LIMIT {PAGE_SIZE}
    """,
    group="pagination_ext",
)
def scan_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One page of the orders table strictly after the cursor
    (o_orderdate, o_orderkey), ordered by the same compound key — the
    keyset/seek pagination pattern (explicit OR-form of the row-value
    comparison ``(date, key) > (cursor_date, cursor_key)``).

    Scale shape: the date half of the predicate is sargable — it reaches
    the parquet scan as a PushedFilter, so row groups entirely before
    the cursor date are skipped via min/max stats (at 100 TB, with the
    table date-partitioned or range-clustered as sink_sorted_parquet
    lays it out, whole files prune). The page fetch itself is a
    TakeOrderedAndProject (per-partition top-{PAGE_SIZE}, then a
    {PAGE_SIZE}-row merge on the driver) — page depth never multiplies
    cost, unlike OFFSET's scan-and-discard. Plan asserted in
    tests/test_pagination_ext.py.
    """
    o = load_table(spark, sf_dir, "orders")
    cursor_date = F.lit(CURSOR_DATE).cast("timestamp")
    after_cursor = (F.col("o_orderdate") > cursor_date) | (
        (F.col("o_orderdate") == cursor_date)
        & (F.col("o_orderkey") > CURSOR_KEY)
    )
    return (
        o.where(after_cursor)
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy("o_orderdate", "o_orderkey")
        .limit(PAGE_SIZE)
    )
