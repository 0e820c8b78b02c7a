"""Time-series depth ops, round 5 batch 3: OHLC bars and inter-arrival
statistics over the events stream — the two aggregate shapes monitoring
and market-data pipelines run continuously (extensions/corpus_timeseries
holds the r4-verified EWMA/transition/gapfill tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "events_ohlc_bars",
    oracle="""
        WITH ranked AS (
            SELECT date_trunc('hour', ts) AS bar, event_type, value,
                   row_number() OVER (PARTITION BY date_trunc('hour', ts),
                                      event_type ORDER BY ts, event_id)
                       AS rn_a,
                   row_number() OVER (PARTITION BY date_trunc('hour', ts),
                                      event_type ORDER BY ts DESC,
                                      event_id DESC) AS rn_d
            FROM events)
        SELECT bar, event_type,
               round(max(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
               round(max(value), 4) AS high,
               round(min(value), 4) AS low,
               round(max(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
               count(*) AS volume
        FROM ranked
        GROUP BY bar, event_type
    """,
    group="timeseries_ext",
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type: open/high/low/close of ``value``
    with volume — the canonical downsampling shape for tick-like streams.

    Scale shape: open/close come from two row_number windows over the
    SAME (bar, event_type) partitioning the final aggregate groups on,
    so one exchange serves all three passes (window, window, hash agg —
    Catalyst chains them without re-shuffling). Total tie-break
    (ts, event_id) makes open/close deterministic under timestamp ties.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("bar"), "event_type", "value",
        "ts", "event_id",
    )
    asc = Window.partitionBy("bar", "event_type").orderBy("ts", "event_id")
    desc = Window.partitionBy("bar", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.withColumn("rn_a", F.row_number().over(asc)).withColumn(
        "rn_d", F.row_number().over(desc)
    )
    first_v = F.when(F.col("rn_a") == 1, F.col("value"))
    last_v = F.when(F.col("rn_d") == 1, F.col("value"))
    return ranked.groupBy("bar", "event_type").agg(
        F.round(F.max(first_v), 4).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(F.max(last_v), 4).alias("close"),
        F.count("*").alias("volume"),
    )


@register(
    "events_interarrival_stats",
    oracle="""
        WITH gaps AS (
            SELECT event_type,
                   CAST(epoch_us(ts - lag(ts) OVER w) AS DOUBLE) / 1e6
                       AS gap_s
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
        SELECT event_type,
               count(gap_s) AS n_gaps,
               round(avg(gap_s), 4) AS avg_gap_s,
               round(min(gap_s), 6) AS min_gap_s,
               round(max(gap_s), 4) AS max_gap_s
        FROM gaps
        GROUP BY event_type
    """,
    group="timeseries_ext",
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics per event type (lag-difference in
    seconds): the heartbeat profile — a collapsing min or exploding max
    flags duplicate floods or pipeline stalls before dashboards do.

    Scale shape: one shuffle on event_type serves both the lag window
    and the final aggregate; the gap math is µs-integer (epoch
    difference) divided once at the end, so no float accumulation
    drift between engines. First event per type yields a NULL gap,
    excluded from count/avg identically in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gap_s = (
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).cast("double")
        / 1e6
    )
    return (
        ev.select("event_type", gap_s.alias("gap_s"))
        .groupBy("event_type")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.round(F.avg("gap_s"), 4).alias("avg_gap_s"),
            F.round(F.min("gap_s"), 6).alias("min_gap_s"),
            F.round(F.max("gap_s"), 4).alias("max_gap_s"),
        )
    )
