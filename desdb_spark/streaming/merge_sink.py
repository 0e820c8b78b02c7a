"""Round-8: streaming CDC applied to the manifest table — each
micro-batch of upserts commits one copy-on-write MERGE version via
``foreachBatch`` + :func:`desdb_spark.sources.lake_dml.merge_into`. This
is the production streaming-ingest shape on every lakehouse (a Delta /
Iceberg `MERGE INTO` inside foreachBatch), and it upgrades the promise
in streaming/foreach.py's docstring ("on a table format the same body
becomes MERGE INTO") into a real implementation: the rewrite cost per
batch is the zone-map-touched files, not the table.

Correctness under replay: the batch rows carry ABSOLUTE target values
(set-to-value, never read-modify-write), so a checkpoint-replayed batch
merges to the identical table content at a new version — exactly-once
table state from at-least-once delivery.

Hash-checked end to end: however availableNow splits the staged files
into micro-batches, every key is delivered exactly once, merges touch
disjoint keys, and the final version's aggregate equals DuckDB applying
the full update/insert definition to the source table in one shot.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table
from desdb_spark.sources.lake_dml import BUMP_CENTS, UPD_MOD, _base, merge_into
from desdb_spark.sources.sinks import _stage_dir
from desdb_spark.sources.time_travel import read_as_of, write_version

#: v1 = orders strictly before the pivot; the stream delivers the rest
#: as inserts plus price bumps for pre-pivot keys % UPD_MOD == 0.
PIVOT_DATE = "1998-01-01"
#: The staged CDC feed is split into this many files, processed one per
#: micro-batch (maxFilesPerTrigger=1).
N_BATCH_FILES = 3


def latest_version(root: str) -> int:
    return max(
        int(f[1:-5]) for f in os.listdir(os.path.join(root, "manifest"))
    )


def run_stream_merge(spark: SparkSession, sf_dir: str) -> str:
    """Build v1, stage the CDC feed, run the foreachBatch merge stream to
    completion, and return the table root. Wipes its own state first so
    repeated in-session invocations rebuild deterministically (stale
    manifests would otherwise reference overwritten v1 files)."""
    root = _stage_dir(spark, "dml_stream_orders")
    ckpt = _stage_dir(spark, "dml_stream_ckpt")
    for d in (root, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("k"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        "o_orderdate",
    )
    pre = o.where(F.col("o_orderdate") < PIVOT_DATE).select("k", "cents")
    write_version(
        pre.repartitionByRange(4, "k").sortWithinPartitions("k"),
        root,
        1,
        stats_col="k",
    )

    updates = pre.where(F.col("k") % UPD_MOD == 0).select(
        "k", (F.col("cents") + BUMP_CENTS).alias("cents")
    )
    inserts = o.where(F.col("o_orderdate") >= PIVOT_DATE).select("k", "cents")
    feed_dir = os.path.join(root, "cdc_feed")
    updates.unionByName(inserts).repartition(N_BATCH_FILES).write.mode(
        "overwrite"
    ).parquet(feed_dir)

    stream = (
        spark.readStream.schema("k bigint, cents bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )

    def apply_batch(bdf: DataFrame, _batch_id: int) -> None:
        v = latest_version(root)
        merge_into(spark, root, v, v + 1, bdf)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        # Never read a half-merged table: stop the query (so it cannot
        # keep committing under a later rmtree) and fail loudly.
        q.stop()
        raise RuntimeError("stream merge did not finish within 300s")
    return root


@register(
    "stream_merge_manifest_table",
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS sum_cents,
               CAST(max(k) AS BIGINT) AS max_key
        FROM (
            SELECT o_orderkey AS k,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT)
                     + CASE WHEN o_orderdate < DATE '{PIVOT_DATE}'
                                 AND o_orderkey % {UPD_MOD} = 0
                            THEN {BUMP_CENTS} ELSE 0 END AS cents
            FROM orders
        ) t
    """,
    group="streaming",
)
def stream_merge_manifest_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream of CDC upserts → one copy-on-write MERGE commit per
    micro-batch → aggregate of the FINAL version, hashed against DuckDB
    applying the whole update/insert definition to the source at once.
    A dropped batch, a double-applied bump, or a zone-map misroute each
    flips sum_cents.

    Scale shape: per batch the table-side cost is (touched files read +
    rewritten) via a sort-merge join against the batch — proportional to
    the batch's key locality, never the table; stream-side state is
    zero (all keyed state lives in the table, as in foreach.py).
    """
    root = run_stream_merge(spark, sf_dir)
    t = read_as_of(spark, root, latest_version(root))
    return t.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.max("k").cast("bigint").alias("max_key"),
    )
