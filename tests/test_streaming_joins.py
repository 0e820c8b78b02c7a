"""Registered stream-stream enrich join: real streaming run vs batch oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.session import load_table
from desdb_spark.streaming.joins import stream_stream_enrich_join
from tests.conftest import SF_DIR


def test_stream_enrich_matches_batch_interval_join(spark):
    got = stream_stream_enrich_join(spark, SF_DIR)
    n_stream = got.count()

    e = load_table(spark, SF_DIR, "events")
    v = e.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("purchase_ts")
    )
    batch = v.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts") - F.expr("INTERVAL 30 minutes"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 minutes")),
    )
    assert n_stream == batch.count()
    assert n_stream > 0
    assert got.columns == ["user_id", "view_ts", "purchase_ts"]
