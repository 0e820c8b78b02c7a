"""Temporal / slowly-changing-dimension operators (round 5).

The desdb catalog workflow reconstructs file histories from release runs
[desdb:files.py runconfig — reconstructed, SURVEY.md §0]; the engine
generalizes that to the standard temporal-modeling shape: build an SCD2
validity-interval history from an append-only event log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "scd2_event_type_history",
    oracle="""
        WITH ordered AS (
          SELECT user_id, event_type, ts,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev,
                 event_id
          FROM events),
        seg AS (
          SELECT user_id, event_type, ts,
                 sum(CASE WHEN prev IS NULL OR prev <> event_type
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seg_id
          FROM ordered),
        spans AS (
          SELECT user_id, seg_id, event_type, min(ts) AS valid_from,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM seg GROUP BY user_id, seg_id, event_type)
        SELECT user_id, event_type, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id
                                      ORDER BY seg_id) AS valid_to,
               n_events
        FROM spans
    """,
    group="temporal",
)
def scd2_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: collapse each user's event stream into
    validity intervals of their current event_type — one row per run of
    equal consecutive values, with [valid_from, valid_to) spans and a
    NULL valid_to marking the current state. The classic gaps-and-islands
    → change-capture shape every warehouse dimension load runs.

    Determinism: events are ordered by (ts, event_id) — event_id is
    unique, so the run segmentation is a total order in both engines.

    Scale shape: ONE shuffle on user_id serves all three passes — the
    lag window, the running change-count window, and the per-segment
    aggregate all partition on the same key, so Catalyst plans a single
    exchange followed by in-partition sorts. No self-join: the interval
    close (valid_to) is a lead() over the already-aggregated segment
    rows (~runs, not events). At 100 TB the per-user partition is
    bounded by one user's history — the natural unit.
    """
    e = load_table(spark, sf_dir, "events")
    w_row = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w_row).alias("prev"),
    )
    seg = ordered.withColumn(
        "seg_id",
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("prev") != F.col("event_type")), 1
            ).otherwise(0)
        ).over(w_row),
    )
    spans = seg.groupBy("user_id", "seg_id", "event_type").agg(
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    w_seg = Window.partitionBy("user_id").orderBy("seg_id")
    return spans.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_seg).alias("valid_to"),
        "n_events",
    )
