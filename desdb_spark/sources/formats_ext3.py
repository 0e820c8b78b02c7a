"""Round-6 batch-2 source format: the Spark 4 built-in XML reader/writer
round trip — the last first-class spark.read format the engine had not
exercised (parquet/csv/json/orc/text/binaryFile are all registered).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

_XML_ORACLE = """
    SELECT count(*) AS n_rows,
           CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands,
           CAST(sum(p_size) AS BIGINT) AS total_size,
           round(sum(p_retailprice), 2) AS total_price,
           min(p_name) AS first_name
    FROM part
"""


@register("source_xml_roundtrip", oracle=_XML_ORACLE, group="sources_ext")
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML as sink and source (Spark 4 native `format("xml")`): stage a
    part projection out as XML documents, read them back with an explicit
    schema, and aggregate — the differential against the parquet original
    certifies value fidelity through XML serialization (numerics survive
    text round-tripping, strings survive escaping).

    The read supplies the schema explicitly: XML inference re-derives
    types from text and is both slower (extra pass) and looser (a column
    of digit-strings infers numeric) — never let 100 TB of ingest hang
    off inference.

    Scale shape: XML files don't split within a document tree, so
    parallelism = number of staged files (here: the write's partition
    count); the aggregate ships one partial row per task. At real scale
    keep XML at the ingest edge and convert to parquet immediately —
    this op IS that conversion shape.
    """
    from desdb_spark.sources.sinks import _stage_dir

    cols = ["p_partkey", "p_name", "p_brand", "p_size", "p_retailprice"]
    part = load_table(spark, sf_dir, "part").select(*cols)
    out = _stage_dir(spark, "src_xml")
    (
        part.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "parts")
        .option("rowTag", "part")
        .save(out)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "part")
        .schema(part.schema)
        .load(out)
    )
    return back.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("p_brand").alias("n_brands"),
        F.sum("p_size").cast("bigint").alias("total_size"),
        F.round(F.sum("p_retailprice"), 2).alias("total_price"),
        F.min("p_name").alias("first_name"),
    )
