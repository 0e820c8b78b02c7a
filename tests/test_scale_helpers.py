"""Scale-lever library helpers: salted skew join, stream-stream interval
join. Each is verified against its plain batch equivalent."""

from __future__ import annotations

import glob
import shutil
import tempfile

from pyspark.sql import functions as F

from desdb_spark.operators.joins import salted_join
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")
    plain = o.join(c, o.o_custkey == c.c_custkey).select("o_orderkey", "c_name")
    salted = salted_join(o, c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
    got = sorted(map(tuple, salted.select("o_orderkey", "c_name").collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want and len(want) > 0


def test_salted_join_left_outer_keeps_unmatched(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (99, "z")], "k bigint, va string")
    b = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k bigint, vb double")
    out = {r.k: r.vb for r in salted_join(a, b, "k", salt=4, how="left").collect()}
    assert out == {1: 10.0, 2: 20.0, 99: None}


def test_stream_stream_interval_join_matches_batch(spark):
    """Real double readStream → interval join → memory sink equals the batch
    join of the same inputs (complete input, availableNow)."""
    from desdb_spark.streaming.runner import run_available_now
    from desdb_spark.streaming.windows import stream_stream_interval_join

    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "user_id", "ts", "value")
        .limit(2000)
        .cache()
    )
    left_b = ev.where(F.col("event_id") % 2 == 0)
    right_b = ev.where(F.col("event_id") % 2 == 1)

    stage_l = tempfile.mkdtemp(prefix="desdb_ssj_l_")
    stage_r = tempfile.mkdtemp(prefix="desdb_ssj_r_")
    try:
        left_b.write.mode("overwrite").parquet(stage_l)
        right_b.write.mode("overwrite").parquet(stage_r)
        ls = spark.readStream.schema(left_b.schema).parquet(stage_l)
        rs = spark.readStream.schema(right_b.schema).parquet(stage_r)
        joined = stream_stream_interval_join(
            ls, rs, key="user_id", interval="5 minutes", watermark="10 minutes"
        ).select(
            F.col("l.event_id").alias("le"),
            F.col("r.event_id").alias("re"),
        )
        got = run_available_now(spark, joined, "ssj_demo", "append")
        batch = (
            stream_stream_interval_join(
                left_b, right_b, key="user_id", interval="5 minutes"
            )
            .select(F.col("l.event_id").alias("le"), F.col("r.event_id").alias("re"))
        )
        got_set = set(map(tuple, got.collect()))
        want_set = set(map(tuple, batch.collect()))
        assert got_set == want_set and len(want_set) > 0
    finally:
        shutil.rmtree(stage_l, ignore_errors=True)
        shutil.rmtree(stage_r, ignore_errors=True)


def test_foreach_batch_upsert_idempotent(spark):
    """Two availableNow passes over overlapping inputs: keys stay unique and
    later values win only for new batches; re-running with no new data is a
    no-op (the exactly-once merge shape)."""
    from desdb_spark.streaming.runner import run_foreach_batch_upsert

    src = tempfile.mkdtemp(prefix="fbu_src_")
    tgt = tempfile.mkdtemp(prefix="fbu_tgt_") + "/t"
    ckpt = tempfile.mkdtemp(prefix="fbu_ckpt_")
    try:
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "k bigint, v string"
        ).coalesce(1).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema

        def run():
            run_foreach_batch_upsert(
                spark,
                spark.readStream.schema(schema).parquet(src),
                tgt,
                keys=["k"],
                checkpoint=ckpt,
            )

        run()
        first = {r.k: r.v for r in spark.read.parquet(tgt).collect()}
        assert first == {1: "a", 2: "b"}
        # New file with an overlapping key and a new key.
        spark.createDataFrame(
            [(2, "b2"), (3, "c")], "k bigint, v string"
        ).coalesce(1).write.mode("append").parquet(src)
        run()
        second = {r.k: r.v for r in spark.read.parquet(tgt).collect()}
        assert second in ({1: "a", 2: "b", 3: "c"}, {1: "a", 2: "b2", 3: "c"})
        assert len(spark.read.parquet(tgt).collect()) == 3
        run()  # no new data: no-op
        assert {r.k: r.v for r in spark.read.parquet(tgt).collect()} == second
    finally:
        for d in (src, ckpt, tgt.rsplit("/", 1)[0]):
            shutil.rmtree(d, ignore_errors=True)
