"""Scan operators: full scan, projection pushdown, predicate pushdown.

Reference parity: every desdb query starts as an Oracle table scan shipped
via ``Connection.quick(sql)`` [desdb:desdb.py — reconstructed, SURVEY.md §0];
scan shaping (column lists, WHERE clauses) appears throughout the canned
queries in [desdb:files.py get_release_runs / Red / Coadd — SURVEY.md §2A
A5/A6]. Here scans are declarative ``spark.read.parquet`` plans so Catalyst
pushes projections and predicates into the parquet reader.

Scale notes (100 TB): correctness of these three ops *is* the scale story —
``tests/test_plans.py`` asserts the physical plan actually contains
``PushedFilters`` / a pruned ``ReadSchema``, because a scan that reads 11
columns for a 3-column projection is wrong at any scale and fatal at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table, values_frame


@register(
    "scan_parquet_full",
    oracle="SELECT r_regionkey, r_name FROM region",
    group="scans",
)
def scan_parquet_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of a small table (SURVEY.md §2B scan_parquet_full)."""
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@register(
    "scan_projection_pushdown",
    oracle="SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem",
    group="scans",
)
def scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read 3 of 11 lineitem columns — Catalyst prunes the parquet scan."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


@register(
    "scan_predicate_pushdown",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    group="scans",
)
def scan_predicate_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered scan — predicate reaches the parquet row-group filters."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@register("schema_describe", group="scans")  # rows-only: type names are engine-specific
def schema_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column name/type listing — desdb's ``describe`` (SURVEY.md §2A A4)."""
    df = load_table(spark, sf_dir, "lineitem")
    rows = [(f.name, f.dataType.simpleString(), f.nullable) for f in df.schema.fields]
    # r17: inline VALUES emit (see values_frame).
    return values_frame(spark, rows, "col_name string, data_type string, nullable boolean")
