"""Source-format extensions (round 5): ORC round trip.

Extends the sources tier (sources/sinks.py, frozen at its r2-verified
state) with the remaining columnar format Spark supports natively. The
op follows the established roundtrip contract: stage the fixture out in
the format, read it back as a *source*, aggregate, and hash-check the
aggregate against DuckDB reading the ORIGINAL parquet — any type or
value infidelity in the format round trip breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

_ORC_ORACLE = """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS distinct_keys,
           round(sum(o_totalprice), 2) AS sum_price,
           max(o_orderdate) AS max_date
    FROM orders GROUP BY o_orderstatus
"""


@register("source_orc_roundtrip", oracle=_ORC_ORACLE, group="sources_ext")
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC as both sink and source: columnar write with predicate-
    pushdown-capable stripes, schema-preserving read-back, value
    fidelity certified by the differential against the parquet original
    (timestamps, doubles, and bigints must all survive bit-true).

    Scale shape: identical to the parquet path — ORC is a splittable
    columnar format, so the read parallelizes by stripe, pushes the
    aggregate's column set into the reader, and the groupBy shuffles
    5 partial rows per task.
    """
    # Lazy import: a module-level import of sources.sinks would register
    # its 5 ops ahead of their _OP_MODULES slot (see joins_ext note).
    from desdb_spark.sources.sinks import _stage_dir

    proj = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    out = _stage_dir(spark, "src_orc")
    proj.write.mode("overwrite").orc(out)
    back = spark.read.schema(proj.schema).orc(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("o_orderkey").alias("distinct_keys"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.max("o_orderdate").alias("max_date"),
    )
