"""Left-outer stream-stream interval join: the flushed region must equal
the batch left join exactly, nulls included."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.session import load_table
from desdb_spark.streaming.outer_join import (
    CUTOFF,
    INTERVAL,
    stream_stream_left_outer_join,
)
from tests.conftest import SF_DIR


def test_left_outer_stream_equals_batch_in_flushed_region(spark, tables):
    out = stream_stream_left_outer_join(spark, SF_DIR)
    got = {(r.user_id, r.view_ts, r.purchase_ts) for r in out.collect()}

    ev = tables["events"]
    min_max = (
        ev.where(F.col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .agg(F.min("m"))
        .first()[0]
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"), F.col("ts").alias("view_ts")
    ).where(F.col("view_ts") < F.lit(min_max) - F.expr(f"INTERVAL {CUTOFF}"))
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("purchase_ts")
    )
    cond = (
        (F.col("v_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts") - F.expr(f"INTERVAL {INTERVAL}"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {INTERVAL}"))
    )
    want = {
        (r.v_user_id, r.view_ts, r.purchase_ts)
        for r in v.join(p, cond, "leftOuter").collect()
    }
    assert got == want
    # outer semantics actually exercised: both matched and null rows exist
    assert any(pt is None for _, _, pt in got)
    assert any(pt is not None for _, _, pt in got)


def test_full_outer_stream_equals_batch_in_flushed_region(spark, tables):
    from desdb_spark.streaming.outer_join import stream_stream_full_outer_join

    out = stream_stream_full_outer_join(spark, SF_DIR)
    got = {(r.user_id, r.view_ts, r.purchase_ts) for r in out.collect()}

    ev = tables["events"]
    min_max = (
        ev.where(F.col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .agg(F.min("m"))
        .first()[0]
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"), F.col("ts").alias("view_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("purchase_ts")
    )
    cond = (
        (F.col("v_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts") - F.expr(f"INTERVAL {INTERVAL}"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {INTERVAL}"))
    )
    cut = F.lit(min_max) - F.expr(f"INTERVAL {CUTOFF}")
    bj = (
        v.join(p, cond, "fullOuter")
        .select(
            F.coalesce("v_user_id", "p_user_id").alias("user_id"),
            "view_ts",
            "purchase_ts",
        )
        .where(
            (F.col("view_ts").isNull() | (F.col("view_ts") < cut))
            & (F.col("purchase_ts").isNull() | (F.col("purchase_ts") < cut))
        )
    )
    want = {(r.user_id, r.view_ts, r.purchase_ts) for r in bj.collect()}
    assert got == want
    # all three row species present: matched, view-only, purchase-only
    assert any(vt is not None and pt is not None for _, vt, pt in got)
    assert any(pt is None for _, _vt, pt in got)
    assert any(vt is None for _, vt, _pt in got)
