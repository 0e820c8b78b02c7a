"""Streaming semantics (SURVEY.md §5.2.5): late-data watermark drop, and
streaming-vs-batch window agreement on a complete input."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime

from pyspark.sql import functions as F

from desdb_spark.streaming.windows import stream_tumbling_window
from tests.conftest import SF_DIR


def test_streaming_final_equals_batch(spark):
    """availableNow streaming tumbling agg == batch tumbling agg."""
    from desdb_spark.streaming.windows import stream_late_data_watermark

    stream_rows = stream_late_data_watermark(spark, SF_DIR).count()
    batch_rows = (
        stream_tumbling_window(spark, SF_DIR)
        .groupBy("window_start", "event_type")
        .count()
        .count()
    )
    assert stream_rows == batch_rows


def test_streaming_demo_ops_idempotent(spark):
    """Double invocation in one session must not clash on the memory-sink
    name, must return identical results, and must clean its staging dirs
    (ADVICE r1: leaked tempdirs + fixed queryName)."""
    import glob

    from desdb_spark.streaming.windows import stream_late_data_watermark

    before = set(glob.glob(f"{tempfile.gettempdir()}/desdb_stream_src_*"))
    r1 = stream_late_data_watermark(spark, SF_DIR)
    r2 = stream_late_data_watermark(spark, SF_DIR)
    a = sorted(map(tuple, r1.collect()))
    b = sorted(map(tuple, r2.collect()))
    assert a == b and len(a) > 0
    # Staging dirs created by these runs are removed once the query
    # terminates (pre-existing dirs from other processes are not ours).
    after = set(glob.glob(f"{tempfile.gettempdir()}/desdb_stream_src_*"))
    assert after - before == set()


def test_watermark_drops_late_rows(spark):
    """Two availableNow runs over one checkpoint; run 2 delivers a row older
    than the watermark established in run 1 → append-mode output must never
    include it (the 10:00 window stays finalized at cnt=2)."""
    src = tempfile.mkdtemp(prefix="late_src_")
    ckpt = tempfile.mkdtemp(prefix="late_ckpt_")
    sink = tempfile.mkdtemp(prefix="late_sink_")
    try:
        schema = "event_id bigint, ts timestamp, value double"

        def run_trigger():
            q = (
                spark.readStream.schema(spark.read.parquet(src).schema)
                .parquet(src)
                .withWatermark("ts", "10 minutes")
                .groupBy(F.window("ts", "1 hour"))
                .agg(F.count("*").alias("cnt"))
                .select(F.col("window.start").alias("ws"), "cnt")
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        # Run 1: events up to 12:00 -> watermark 11:50 -> the 10:00-11:00
        # window (end 11:00 <= 11:50) finalizes and emits cnt=2.
        spark.createDataFrame(
            [
                (1, datetime(2024, 1, 1, 10, 5), 1.0),
                (2, datetime(2024, 1, 1, 10, 20), 1.0),
                (3, datetime(2024, 1, 1, 12, 0), 1.0),
            ],
            schema,
        ).coalesce(1).write.mode("append").parquet(src)
        run_trigger()

        # Run 2: a late row for the already-finalized 10:00 window.
        spark.createDataFrame(
            [(4, datetime(2024, 1, 1, 10, 30), 99.0)], schema
        ).coalesce(1).write.mode("append").parquet(src)
        run_trigger()

        out = spark.read.parquet(sink).collect()
        hour10 = [r.cnt for r in out if r.ws == datetime(2024, 1, 1, 10, 0)]
        # Exactly one finalized emission for the 10:00 window, without the
        # late row: watermark discipline dropped event_id=4.
        assert hour10 == [2]
    finally:
        for d in (src, ckpt, sink):
            shutil.rmtree(d, ignore_errors=True)
