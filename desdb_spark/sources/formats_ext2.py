"""Source-format extensions, round 5 batch 2: line-text round trip.

Completes the native-source matrix (parquet/csv/json/orc already
registered): ``spark.read.text`` — the rawest ingest surface, and the one
every web-scale text pipeline starts from (one document or log line per
row, no schema but a string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

_TEXT_ORACLE = """
    SELECT count(*) AS n_lines,
           CAST(count(DISTINCT p_name) AS BIGINT) AS distinct_names,
           CAST(sum(length(p_name)) AS BIGINT) AS total_chars,
           min(p_name) AS first_name
    FROM part
"""


@register("source_text_roundtrip", oracle=_TEXT_ORACLE, group="sources_ext")
def source_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-text as sink and source: stage part names out via
    ``df.write.text`` (one value per line), read them back with
    ``spark.read.text``, and aggregate — the differential against the
    parquet original certifies byte fidelity of the line round trip.
    p_name is newline-free by construction, which is the format's
    contract (text has no quoting; embedded newlines need csv/json).

    Scale shape: text files split on line boundaries, so the read-back
    parallelizes like any splittable source; the aggregate ships one
    partial row per task. min() gives an order-insensitive value probe.
    """
    from desdb_spark.sources.sinks import _stage_dir

    names = load_table(spark, sf_dir, "part").select("p_name")
    out = _stage_dir(spark, "src_text")
    names.write.mode("overwrite").text(out)
    back = spark.read.text(out)  # single column `value`
    return back.agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("value").alias("distinct_names"),
        F.sum(F.length("value")).alias("total_chars"),
        F.min("value").alias("first_name"),
    )
