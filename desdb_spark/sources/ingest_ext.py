"""Ingest-robustness sources, round 5 batch 8: raw binary-file scan and
malformed-record CSV handling — the two front doors of a real lake
ingest: media files arrive as opaque bytes, and third-party CSV always
contains garbage rows that must be quarantined, not crash the job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

_BF_DOCS = 20  # files staged for the binary scan

_BF_ORACLE = f"""
    SELECT count(*) AS n_files,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           min(md5(text)) AS min_md5,
           max(md5(text)) AS max_md5
    FROM documents WHERE doc_id < {_BF_DOCS}
"""


@register("source_binaryfile_scan", oracle=_BF_ORACLE, group="ingest_ext")
def source_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-file ingest via Spark's built-in ``binaryFile`` source: a
    directory of opaque files becomes (path, length, content) rows — the
    entry point of every media pipeline (extensions/multimodal*) before
    any decode touches the bytes. Staged files carry document texts as
    payloads, so the differential (count, total bytes, min/max content
    digest vs the documents table) certifies byte fidelity of the whole
    stage-write → binary-scan path.

    Scale shape: binaryFile lists and reads files in parallel (one
    whole file per row — it is for payload ingest, not splittable
    scans); content stays binary end-to-end, digests are computed
    scan-side, and the aggregate ships four values per task. Size
    guard at 100 TB: pair with maxBytesPerTrigger-style batching and
    keep oversized payloads in object storage behind pointer columns.
    """
    from desdb_spark.sources.sinks import _stage_dir

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _BF_DOCS)
        .select("doc_id", "text")
        .collect()
    )
    out = _stage_dir(spark, "ingest_binfiles")
    os.makedirs(out, exist_ok=True)
    for r in docs:
        with open(os.path.join(out, f"doc_{r.doc_id}.bin"), "wb") as fh:
            fh.write(r.text.encode("utf-8"))
    files = spark.read.format("binaryFile").load(out)
    return files.agg(
        F.count("*").alias("n_files"),
        F.sum("length").alias("total_bytes"),
        F.min(F.md5("content")).alias("min_md5"),
        F.max(F.md5("content")).alias("max_md5"),
    )


@register("source_csv_malformed_audit", group="ingest_ext")  # rows-only: parser-specific
def source_csv_malformed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record discipline for CSV ingest: stage a file with
    planted garbage rows, read PERMISSIVE with a corrupt-record column,
    and report (valid, quarantined, dropped-mode count) — the pattern
    that keeps a 100 TB backfill running when 0.1% of rows are junk,
    while losing none of them silently. Exact quarantine counts are
    asserted in tests/test_ingest_ext.py; parser edge behavior is
    engine-specific, hence rows-only.

    Scale shape: PERMISSIVE parsing is scan-side; the corrupt column is
    just another projected column, so quarantining costs nothing extra
    and the bad rows can be written to a dead-letter sink from the same
    scan.
    """
    from desdb_spark.sources.sinks import _stage_dir

    out = _stage_dir(spark, "ingest_badcsv")
    os.makedirs(out, exist_ok=True)
    o = load_table(spark, sf_dir, "orders").limit(50).select(
        "o_orderkey", "o_totalprice"
    )
    rows = [f"{r.o_orderkey},{r.o_totalprice}" for r in o.collect()]
    # plant garbage: wrong arity, non-numeric, empty
    rows[3:3] = ["7,not_a_number", "1,2,3,4", ","]
    with open(os.path.join(out, "orders.csv"), "w") as fh:
        fh.write("id,price\n" + "\n".join(rows) + "\n")
    schema = "id bigint, price double, _corrupt string"
    permissive = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema(schema)
        .csv(out)
        .cache()
    )
    dropped = (
        spark.read.option("header", True)
        .option("mode", "DROPMALFORMED")
        .schema("id bigint, price double")
        .csv(out)
    )
    # CSV gotcha worth encoding: a bare count() lets the parser PRUNE all
    # typed columns, so conversion never runs and DROPMALFORMED drops
    # nothing (and Catalyst folds any never-null count expression back to
    # count(1), re-enabling the prune). Materializing the rows is the
    # only reliable way to observe drop semantics; bounded here (≤53
    # rows) because this is a staged audit, not a data path — at scale,
    # quarantine with PERMISSIVE + corrupt column instead, as above.
    n_after_drop = len(dropped.collect())
    return permissive.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("_corrupt").isNull(), 1)).alias("n_valid"),
        F.count("_corrupt").alias("n_quarantined"),
        F.lit(n_after_drop).alias("n_after_dropmalformed"),
    )
