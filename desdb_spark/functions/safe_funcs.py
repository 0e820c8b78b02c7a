"""Round-6 batch-22 error-safe (ANSI try_*) scalar surface.

Under ANSI SQL semantics a single malformed row kills a 100 TB job at
hour nine — division by zero, a bad cast, an out-of-bounds index. The
engine answer is the try_* family: same expression, NULL instead of an
exception, quarantine the NULLs downstream. This op exercises
``try_divide``, ``try_cast`` (via the malformed-prefix parse), and
out-of-bounds element access together and reports the success/null
census — the shape of a parse-quality audit on raw ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "scalar_try_funcs",
    oracle="""
        WITH raw AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 5 = 0 THEN NULL
                        ELSE o_totalprice / (o_orderkey % 5) END AS safe_div,
                   try_cast(substr(o_orderpriority, 1, 3) AS INTEGER)
                       AS parsed_prefix,
                   string_split(o_orderpriority, '-')[3] AS third_part
            FROM orders
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(safe_div) AS BIGINT) AS n_div_ok,
               CAST(count(parsed_prefix) AS BIGINT) AS n_parse_ok,
               CAST(count(third_part) AS BIGINT) AS n_third_ok,
               round(sum(safe_div), 2) AS sum_safe_div,
               CAST(sum(parsed_prefix) AS BIGINT) AS sum_parsed
        FROM raw
    """,
    group="safe_funcs",
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar census over orders: ``try_divide`` by a
    modulus that is zero for every 5th key (NULL, not a crash),
    ``try_cast``-style parse of the priority prefix ('1-U' → NULL,
    demonstrating malformed-input tolerance), and out-of-bounds array
    access via ``try_element_at`` (priority strings have two dash
    parts; asking for the third yields NULL). The report counts
    successes per expression plus checksums over the surviving values.

    Scale shape: all narrow row-local expressions inside codegen — the
    point is SEMANTIC: the same scan under strict ANSI mode would
    abort on the first bad row, and try_* is how a long ingest job
    degrades per-row instead of per-job. The oracle spells the same
    semantics with CASE/try_cast/OOB-null list access (DuckDB's list
    indexing is null-on-out-of-bounds by default).
    """
    o = load_table(spark, sf_dir, "orders")
    raw = o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 5).alias(
            "safe_div"
        ),
        F.expr("try_cast(substr(o_orderpriority, 1, 3) AS INT)").alias(
            "parsed_prefix"
        ),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(3)).alias(
            "third_part"
        ),
    )
    return raw.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count("safe_div").cast("bigint").alias("n_div_ok"),
        F.count("parsed_prefix").cast("bigint").alias("n_parse_ok"),
        F.count("third_part").cast("bigint").alias("n_third_ok"),
        F.round(F.sum("safe_div"), 2).alias("sum_safe_div"),
        F.sum("parsed_prefix").cast("bigint").alias("sum_parsed"),
    )
