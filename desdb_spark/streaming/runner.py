"""Shared harness for the real ``readStream`` demo operators.

Two concerns the per-op code was getting wrong (ADVICE r1):

- ``awaitTermination(timeout)`` returns ``False`` on timeout; ignoring it
  meant a hung query could be read mid-flight as a silently partial
  result. Here a timeout raises, and the query is stopped in ``finally``
  either way.
- Each run staged a symlink tempdir and memory-sink name that were never
  cleaned / never unique, so a second invocation in the same session
  could clash or leak. Sink names get a per-process sequence number and
  the staging dir is removed once the query has terminated (the memory
  sink holds its batches in memory, so the result outlives the source
  files).
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

#: Per-process sequence so repeated invocations never reuse a sink name.
_SINK_SEQ = itertools.count()


def stage_file_source(src_file: str, prefix: str) -> str:
    """Stage a single parquet file under a fresh tempdir (the file stream
    source requires a *directory*; fixture trees are read-only)."""
    stage = tempfile.mkdtemp(prefix=prefix)
    os.symlink(src_file, os.path.join(stage, os.path.basename(src_file)))
    return stage


def run_available_now(
    spark: SparkSession,
    stream_df: DataFrame,
    name_prefix: str,
    output_mode: str,
    stage_dir: str | None = None,
    timeout_sec: int = 300,
    progress_sink: list | None = None,
    state_partitions: int | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to a memory sink with trigger=availableNow
    and return the sink table once the query has fully terminated.

    ``progress_sink``: pass a list to receive the query's final
    ``lastProgress`` dict (state-store metrics, row counts) — the query
    object is stopped before return, so progress must be captured here.

    ``state_partitions``: pin the query's number of state partitions
    (Structured Streaming fixes it from ``spark.sql.shuffle.partitions``
    at FIRST-batch planning and it can never change for the checkpoint's
    lifetime — r12b). The partition count never affects results, only
    state layout; it is the deliberate sizing knob for stateful ops.
    Every state partition costs real fixed overhead PER BATCH (store
    open + delta/snapshot write + watermark-flush scan — measured 3.7 s
    for a ZERO-input flush batch at 32 partitions on the stream-stream
    join, ~0.9 s at 8), so demo/fixture queries size it to the data;
    a production job sizes it to peak state volume ÷ target store size
    instead, because repartitioning state later means a new checkpoint.
    The session conf is restored after the query terminates.
    """
    name = f"{name_prefix}_{next(_SINK_SEQ)}"
    prev_width = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        query = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not query.awaitTermination(timeout_sec):
                raise TimeoutError(
                    f"streaming query {name!r} did not terminate within "
                    f"{timeout_sec}s"
                )
            if progress_sink is not None:
                progress_sink.append(query.lastProgress)
        finally:
            query.stop()
            if stage_dir is not None:
                shutil.rmtree(stage_dir, ignore_errors=True)
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_width)
    return spark.table(name)


def run_foreach_batch_upsert(
    spark: SparkSession,
    stream_df: DataFrame,
    target_path: str,
    keys: list[str],
    checkpoint: str,
    timeout_sec: int = 300,
) -> None:
    """Stream → idempotent keyed upsert into a parquet target via
    ``foreachBatch`` (trigger=availableNow, blocks until done).

    The production exactly-once sink shape: foreachBatch hands each
    micro-batch to arbitrary *batch* code together with a batch id that
    Structured Streaming replays deterministically from the checkpoint, so
    a crash between write and commit re-runs the same batch and the
    keyed-overwrite merge makes the replay a no-op. Here the merge is
    read-union-dedup-rewrite (parquet has no row-level merge); on a lake
    format (Delta/Iceberg) the body becomes a real MERGE INTO and the
    rewrite cost drops to the touched files.
    """

    def upsert(batch_df: DataFrame, _batch_id: int) -> None:
        batch = batch_df.dropDuplicates(keys)
        try:
            existing = spark.read.parquet(target_path)
            merged = (
                existing.join(batch.select(*keys), keys, "left_anti").unionByName(batch)
            )
        except Exception:  # noqa: BLE001 — first batch: target doesn't exist yet
            merged = batch
        # Rewrite via a staging dir: the merge plan reads target_path, so an
        # in-place overwrite would clobber its own input mid-job.
        stage = target_path.rstrip("/") + "._staging"
        merged.write.mode("overwrite").parquet(stage)
        final = spark.read.parquet(stage)
        final.write.mode("overwrite").parquet(target_path)
        shutil.rmtree(stage, ignore_errors=True)

    query = (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not query.awaitTermination(timeout_sec):
            raise TimeoutError(f"foreachBatch upsert did not finish in {timeout_sec}s")
    finally:
        query.stop()
