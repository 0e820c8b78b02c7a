"""Sinks: formatted result output (SURVEY.md §2A A2, §2B sinks).

Reference parity: desdb's ``quickWrite`` streamed Oracle cursor batches to
CSV / space / tab / JSON with a header line [desdb:desdb.py quickWrite —
SURVEY.md §0]; ``des-query -f`` exposed it on the CLI (A11). The engine
maps formats to distributed ``df.write`` (parquet/csv/json) and provides a
driver-streamed stdout writer for CLI parity.

Scale notes (100 TB): ``df.write`` is executor-parallel — each task writes
its partition; no driver materialization. The stdout writer streams via
``toLocalIterator`` (one partition in driver memory at a time) — it exists
for CLI parity, not for bulk export. Sink ops re-read what they wrote and
return counts, so the rows-only check verifies a write→read round trip.
"""

from __future__ import annotations

import csv
import io
import json
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


def _stage_dir(spark: SparkSession, fmt: str) -> str:
    """Deterministic per-(session, fmt) staging path: repeated invocations
    overwrite in place instead of leaking a fresh tempdir per call."""
    import os

    app = spark.sparkContext.applicationId
    return os.path.join(tempfile.gettempdir(), f"desdb_stage_{fmt}_{app}")


def _roundtrip(df: DataFrame, fmt: str) -> DataFrame:
    """Write df out in ``fmt``, read it back, return count-by-format proof."""
    spark = df.sparkSession
    out = _stage_dir(spark, fmt)
    writer = df.write.mode("overwrite")
    if fmt == "parquet":
        writer.parquet(out)
        back = spark.read.parquet(out)
    elif fmt == "csv":
        writer.option("header", True).csv(out)
        back = spark.read.option("header", True).schema(df.schema).csv(out)
    elif fmt == "json":
        writer.json(out)
        back = spark.read.schema(df.schema).json(out)
    else:
        raise ValueError(fmt)
    return back.agg(
        F.lit(fmt).alias("format"),
        F.count("*").alias("row_cnt"),
        F.countDistinct("o_orderkey").alias("distinct_keys"),
    )


def _sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def _sink_oracle(fmt: str) -> str:
    """Hash upgrade (VERDICT r6 item 4 discipline): the sink proof —
    row count + key cardinality of the re-read output — equals the same
    aggregate DuckDB computes on the source table, so a lossy write or
    partial read fails the differential gate instead of passing a
    rows-only count."""
    return f"""
        SELECT '{fmt}' AS format, CAST(count(*) AS BIGINT) AS row_cnt,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS distinct_keys
        FROM orders
    """


@register("sink_parquet", oracle=_sink_oracle("parquet"), group="sinks")
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet write→read round trip."""
    return _roundtrip(_sample(spark, sf_dir), "parquet")


@register("sink_csv", oracle=_sink_oracle("csv"), group="sinks")
def sink_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV (header=True) write→read round trip — the quickWrite CSV format."""
    return _roundtrip(_sample(spark, sf_dir), "csv")


@register("sink_json", oracle=_sink_oracle("json"), group="sinks")
def sink_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines write→read round trip — the quickWrite JSON format."""
    return _roundtrip(_sample(spark, sf_dir), "json")


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


def write_stream_stdout(df: DataFrame, fmt: str = "csv", out=None) -> int:
    """des-query-style formatted stdout writer (A2/A11 parity).

    Streams one partition at a time through the driver; returns row count.
    Formats: csv, tsv, space, json — desdb's quickWrite format list.
    """
    import sys

    out = out or sys.stdout
    cols = df.columns
    n = 0
    if fmt == "json":
        for row in df.toLocalIterator():
            out.write(json.dumps(row.asDict(), default=str) + "\n")
            n += 1
        return n
    delim = {"csv": ",", "tsv": "\t", "space": " "}[fmt]
    buf = io.StringIO()
    w = csv.writer(buf, delimiter=delim, lineterminator="\n")
    w.writerow(cols)
    for row in df.toLocalIterator():
        w.writerow(row)
        n += 1
        if buf.tell() > 1 << 16:
            out.write(buf.getvalue())
            buf.seek(0)
            buf.truncate()
    out.write(buf.getvalue())
    return n
