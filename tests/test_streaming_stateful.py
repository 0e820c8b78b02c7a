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


def test_transform_with_state_profile(spark, tables):
    """transformWithStateInPandas twin of the profile op — runs only where
    the streaming Python runner's protobuf dependency exists (this
    container lacks it; the wrapper itself is the tested surface)."""
    import pytest

    from desdb_spark.streaming import transform_state
    from desdb_spark.streaming.stateful import ROCKSDB_PROVIDER, _PROVIDER_KEY

    if not transform_state.is_available():
        pytest.skip("google.protobuf unavailable: transformWithState "
                    "streaming runner cannot start in this container")
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
