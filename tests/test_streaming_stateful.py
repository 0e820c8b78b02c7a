"""applyInPandasWithState operator: final state over a complete single-batch
input equals the batch aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.streaming.stateful import stream_stateful_profile
from tests.conftest import SF_DIR


def test_stateful_profile_matches_batch(spark, tables):
    out = {r.user_id: (r.n_events, r.sum_value) for r in
           stream_stateful_profile(spark, SF_DIR).collect()}
    batch = {
        r.user_id: (r.n, round(r.s, 4))
        for r in tables["events"]
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(out) == set(batch)
    for uid, (n, s) in batch.items():
        assert out[uid][0] == n
        assert abs(out[uid][1] - s) < 1e-6
