"""Text-format *source* round trips (SURVEY.md §2B sources), split out of
``sources/sinks.py``: these two ops exercise CSV/JSON as READ formats
(type fidelity of the text round trip), while sinks.py owns the write
paths. The split also keeps each module single-purpose for the driver
window rotation — both ops hold r2-green driver rows and re-prove at HEAD
via the committed selfcheck logs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table
from desdb_spark.sources.sinks import _stage_dir

_ROUNDTRIP_ORACLE = """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS distinct_keys,
           round(sum(o_totalprice), 2) AS sum_price,
           max(o_orderdate) AS max_date
    FROM orders GROUP BY o_orderstatus
"""


def _source_roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    """Stage orders out as ``fmt`` text, read it back as a *source*, and
    aggregate — the aggregate is hash-checked against the same SQL on the
    original parquet, so any type-fidelity loss in the text round trip
    (doubles, timestamps, quoting) fails the differential gate.
    """
    proj = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    out = _stage_dir(spark, f"src_{fmt}")
    if fmt == "csv":
        proj.write.mode("overwrite").option("header", True).csv(out)
        back = spark.read.option("header", True).schema(proj.schema).csv(out)
    else:
        proj.write.mode("overwrite").json(out)
        back = spark.read.schema(proj.schema).json(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("o_orderkey").alias("distinct_keys"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.max("o_orderdate").alias("max_date"),
    )


@register("source_csv_roundtrip", oracle=_ROUNDTRIP_ORACLE, group="sources")
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV as a *source*: header + explicit schema, value-fidelity checked."""
    return _source_roundtrip(spark, sf_dir, "csv")


@register("source_json_roundtrip", oracle=_ROUNDTRIP_ORACLE, group="sources")
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines as a *source*: explicit schema, value-fidelity checked."""
    return _source_roundtrip(spark, sf_dir, "json")
