"""applyInPandasWithState operator: final state over a complete single-batch
input equals the batch aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.streaming.stateful import stream_stateful_profile
from tests.conftest import SF_DIR


def _batch_sum_q(col="value"):
    """The fixed-point 1e-4 batch sum twin of the stateful fold
    (ADVICE r6: integer quantization, no float-rounding boundary)."""
    return F.sum(F.round(F.col(col) * 10_000, 0).cast("long")).alias("s_q")


def test_stateful_profile_matches_batch(spark, tables):
    out = {r.user_id: (r.n_events, r.sum_value, r.last_ts) for r in
           stream_stateful_profile(spark, SF_DIR).collect()}
    batch = {
        r.user_id: (r.n, r.s_q / 10_000, r.last)
        for r in tables["events"]
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            _batch_sum_q(),
            F.max("ts").alias("last"),
        )
        .collect()
    }
    assert set(out) == set(batch)
    for uid, (n, s, last) in batch.items():
        # sum_value is exact: both sides divide the same integer by 1e4.
        assert out[uid][0] == n
        assert out[uid][1] == s
        # last_ts must equal the batch max(ts) exactly (µs precision) —
        # guards the epoch-unit regression flagged in ADVICE r1.
        assert out[uid][2] == last, (uid, out[uid][2], last)


def test_stateful_profile_rocksdb_provider_engaged(spark, tables):
    """The RocksDB arm must (a) actually engage the RocksDB provider —
    visible as rocksdb* customMetrics on the state operator, which the
    default HDFS-backed provider never emits — (b) produce the same
    final state as the batch aggregate, and (c) restore the session's
    provider conf afterwards."""
    from desdb_spark.streaming.stateful import _PROVIDER_KEY

    prior = spark.conf.get(_PROVIDER_KEY, None)
    progress = []
    out = {r.user_id: (r.n_events, r.sum_value) for r in
           stream_stateful_profile(
               spark, SF_DIR, state_store="rocksdb", progress_sink=progress
           ).collect()}
    assert spark.conf.get(_PROVIDER_KEY, None) == prior
    (lp,) = progress
    state_ops = lp["stateOperators"]
    assert state_ops, "no state operator in progress"
    rocks_metrics = [
        k for k in state_ops[0].get("customMetrics", {}) if "rocksdb" in k.lower()
    ]
    assert rocks_metrics, "RocksDB provider did not engage"
    batch = {
        r.user_id: (r.n, r.s_q / 10_000)
        for r in tables["events"]
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), _batch_sum_q())
        .collect()
    }
    assert out == batch


def test_transform_with_state_profile_emulated(spark, tables):
    """r15 (VERDICT r14 item 6 — close the suite's last silent skip):
    drive the EXACT StatefulProcessor class through the protobuf-free
    local lifecycle harness, splitting each user's events across three
    micro-batches so state must thread between handleInputRows calls,
    and pin the FINAL per-key emission against the batch aggregate.
    Exercises the processor's own semantics everywhere; the live
    streaming-runner arm below still runs where protobuf exists."""
    import pandas as pd

    from desdb_spark.streaming.transform_state import (
        emulate_transform_with_state,
        make_profile_processor,
    )

    events = (
        tables["events"]
        .select(
            "user_id",
            F.round(F.col("value") * 10_000, 0).cast("long").alias("value_q"),
        )
        .toPandas()
    )
    # Arrival order: interleave keys batch-by-batch (3 slices per key,
    # possibly empty) — per-key state must survive other keys' batches.
    batches = []
    for i in range(3):
        for uid, grp in events.groupby("user_id"):
            batches.append(((uid,), grp.iloc[i::3]))
    emitted = emulate_transform_with_state(make_profile_processor, batches)
    assert all(isinstance(e, pd.DataFrame) for e in emitted)
    # Update-mode: the LAST emission per key is the final running state.
    final = {}
    for e in emitted:
        final[int(e["user_id"].iloc[0])] = (
            int(e["n_events"].iloc[0]),
            float(e["sum_value"].iloc[0]),
        )
    batch = {
        r.user_id: (r.n, r.s_q / 10_000)
        for r in tables["events"]
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), _batch_sum_q())
        .collect()
    }
    assert final == batch
    # Three emissions per key (one per micro-batch), monotone counts.
    per_key = {}
    for e in emitted:
        per_key.setdefault(int(e["user_id"].iloc[0]), []).append(
            int(e["n_events"].iloc[0])
        )
    for uid, counts in per_key.items():
        assert len(counts) == 3 and counts == sorted(counts), (uid, counts)


def test_local_value_state_exists_tracks_update_not_value():
    """r16 (ADVICE): the real ValueState reports exists()==True after ANY
    update — including update(None) — until clear(); the emulator's slot
    must track existence with a sentinel, not infer it from the value,
    or it could validate processor logic the live runner rejects."""
    from desdb_spark.streaming.transform_state import _LocalValueState

    s = _LocalValueState()
    assert not s.exists()
    s.update(None)
    assert s.exists(), "update(None) must still mark the state as set"
    assert s.get() is None
    s.clear()
    assert not s.exists()
    s.update((1, 2))
    assert s.exists() and s.get() == (1, 2)


def test_transform_with_state_emulation_agrees_with_live_runner(spark, tables):
    """r16 (VERDICT r15 item 5): where the live transformWithState runner
    CAN start, the emulator and the runner must agree on the same input —
    the guard that keeps `emulate_transform_with_state` an honest stand-in
    rather than a parallel semantics. Skip-guarded the same way as the
    live arm (the emulated test above runs everywhere regardless)."""
    import pytest

    from desdb_spark.streaming import transform_state

    if not transform_state.is_available():
        pytest.skip("google.protobuf unavailable: live runner cannot start "
                    "here, so emulation-vs-live agreement is unverifiable "
                    "in this container (emulated arm still runs above)")
    from desdb_spark.session import normalize_events_ts
    from desdb_spark.streaming.runner import run_available_now, stage_file_source
    from desdb_spark.streaming.stateful import ROCKSDB_PROVIDER, _PROVIDER_KEY
    from desdb_spark.streaming.transform_state import (
        emulate_transform_with_state,
        make_profile_processor,
    )

    events = (
        tables["events"]
        .select(
            "user_id",
            F.round(F.col("value") * 10_000, 0).cast("long").alias("value_q"),
        )
        .toPandas()
    )
    emitted = emulate_transform_with_state(
        make_profile_processor,
        [((uid,), grp) for uid, grp in events.groupby("user_id")],
    )
    emu = {
        int(e["user_id"].iloc[0]): (
            int(e["n_events"].iloc[0]),
            float(e["sum_value"].iloc[0]),
        )
        for e in emitted
    }

    prior = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, ROCKSDB_PROVIDER)
    try:
        stage = stage_file_source(f"{SF_DIR}/events.parquet", "tws_agree_")
        schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
        stream = normalize_events_ts(
            spark.readStream.schema(schema).parquet(stage)
        ).select("user_id", "value")
        out = run_available_now(
            spark,
            transform_state.transform_with_state_profile(stream),
            "tws_agree",
            "update",
            stage_dir=stage,
        )
        live = {r.user_id: (r.n_events, r.sum_value) for r in out.collect()}
    finally:
        if prior is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prior)
    assert emu == live


def test_transform_with_state_profile(spark, tables):
    """transformWithStateInPandas twin of the profile op — the LIVE
    streaming-runner arm, runs only where the runner's protobuf
    dependency exists (this container lacks it; the emulated test above
    covers the processor semantics here)."""
    import pytest

    from desdb_spark.streaming import transform_state
    from desdb_spark.streaming.stateful import ROCKSDB_PROVIDER, _PROVIDER_KEY

    if not transform_state.is_available():
        pytest.skip("google.protobuf unavailable: transformWithState "
                    "streaming runner cannot start in this container; "
                    "processor semantics covered by the emulated test")
    from desdb_spark.session import normalize_events_ts
    from desdb_spark.streaming.runner import run_available_now, stage_file_source

    prior = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, ROCKSDB_PROVIDER)
    try:
        stage = stage_file_source(f"{SF_DIR}/events.parquet", "tws_src_")
        schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
        stream = normalize_events_ts(
            spark.readStream.schema(schema).parquet(stage)
        ).select("user_id", "value")
        out = run_available_now(
            spark,
            transform_state.transform_with_state_profile(stream),
            "tws_profile",
            "update",
            stage_dir=stage,
        )
        res = {r.user_id: (r.n_events, r.sum_value) for r in out.collect()}
        batch = {
            r.user_id: (r.n, r.s_q / 10_000)
            for r in tables["events"]
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), _batch_sum_q())
            .collect()
        }
        assert res == batch
    finally:
        if prior is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prior)
