"""Checkpointed restart: the second run of the same query against the
same checkpoint must process ONLY newly-arrived files (exactly-once),
and a third run with nothing new must process zero rows."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from desdb_spark.session import load_table, normalize_events_ts, pin_session_confs
from desdb_spark.streaming.resume import _stage_batch, run_resumable_ingest
from tests.conftest import SF_DIR


def test_restart_processes_only_the_delta(spark):
    pin_session_confs(spark)
    ev = normalize_events_ts(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
    ).select("event_id", "event_type", "value", "ts")
    even = ev.where(F.col("event_id") % 2 == 0)
    odd = ev.where(F.col("event_id") % 2 == 1)
    n_even, n_odd = even.count(), odd.count()
    base = tempfile.mkdtemp(prefix="desdb_resume_test_")
    src, sink, ckpt = (os.path.join(base, d) for d in ("src", "sink", "ckpt"))
    os.makedirs(src)
    try:
        _stage_batch(even, base, src, "b0")
        r1 = run_resumable_ingest(spark, src, sink, ckpt)
        assert r1 == n_even
        _stage_batch(odd, base, src, "b1")
        r2 = run_resumable_ingest(spark, src, sink, ckpt)
        assert r2 == n_odd, f"restart replayed or lost data: {r2} != {n_odd}"
        # Idempotent third run: checkpoint says nothing new.
        r3 = run_resumable_ingest(spark, src, sink, ckpt)
        assert r3 == 0
        # Sink holds every event exactly once.
        sunk = spark.read.parquet(sink)
        assert sunk.count() == n_even + n_odd
        assert sunk.select("event_id").distinct().count() == n_even + n_odd
    finally:
        shutil.rmtree(base, ignore_errors=True)
