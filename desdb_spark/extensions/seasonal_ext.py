"""Round-7: seasonal-baseline anomaly detection — the monitoring shape
for metrics with a daily rhythm. A raw z-score (stats_monitor) flags
every rush hour; the fix every production monitor applies is to score
each observation against ITS OWN seasonal slot: residual = value −
mean(slot), scaled by the slot's deviation, where slot = hour-of-day ×
event type. One aggregate builds the seasonal profile, one broadcast
join scores the stream against it — the fitted-baseline pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: |residual| / slot-stddev threshold for an anomalous hour bucket.
Z_THRESHOLD = 3


@register(
    "events_seasonal_residual_anomaly",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   CAST(extract(hour FROM ts) AS INT) AS hod,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2, 3
        ), profile AS (
            SELECT event_type, hod,
                   CAST(sum(n) AS DOUBLE) / count(*) AS mu,
                   sqrt((CAST(sum(n * n) AS DOUBLE)
                         - CAST(sum(n) AS DOUBLE) * sum(n) / count(*))
                        / (count(*) - 1)) AS sd,
                   CAST(count(*) AS BIGINT) AS slots
            FROM hourly GROUP BY 1, 2
        )
        SELECT h.event_type, h.h AS hour_start, h.n,
               round(p.mu, 4) AS slot_mean,
               round((h.n - p.mu) / p.sd, 4) AS z
        FROM hourly h JOIN profile p
          ON p.event_type = h.event_type AND p.hod = h.hod
        WHERE p.slots >= 3 AND p.sd > 0
          AND abs((h.n - p.mu) / p.sd) >= {Z_THRESHOLD}
        ORDER BY h.event_type, h.h
    """,
    group="seasonal_ext",
)
def events_seasonal_residual_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour buckets whose event count deviates ≥ {Z_THRESHOLD}σ from the
    seasonal baseline for their (event_type, hour-of-day) slot — with
    the raw count, the slot mean, and the z-score.

    Scale shape: the hourly rollup is one groupBy over the fact stream
    (map-side combine on a low-cardinality key); the seasonal profile
    aggregates THAT rollup (24 × |types| rows) and joins back broadcast
    — the stream is scanned once, the baseline is free. Slots with < 3
    observations or zero variance are excluded (a baseline needs
    support). The z computation is a single double division on both
    engines; rounding at 4 dp over exact-integer counts and one
    division keeps the hash stable; the slot deviation comes from exact
    integer sufficient statistics (Σn, Σn²) rather than the engines'
    accumulation-order-dependent built-in stddev.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
        F.hour("ts").alias("hod"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    # mu/sd from exact integer sufficient statistics (Σn, Σn², k): the
    # built-in stddev's Welford accumulation order differs per engine in
    # final ulps; one explicit formula over exact sums is bit-identical.
    profile = (
        hourly.groupBy("event_type", "hod")
        .agg(
            F.sum("n").cast("bigint").alias("s1"),
            F.sum(F.col("n") * F.col("n")).cast("bigint").alias("s2"),
            F.count("*").cast("bigint").alias("slots"),
        )
        .select(
            "event_type",
            "hod",
            "slots",
            (F.col("s1").cast("double") / F.col("slots")).alias("mu"),
            F.sqrt(
                (
                    F.col("s2").cast("double")
                    - F.col("s1").cast("double") * F.col("s1") / F.col("slots")
                )
                / (F.col("slots") - 1)
            ).alias("sd"),
        )
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        hourly.join(F.broadcast(profile), ["event_type", "hod"])
        .where((F.col("slots") >= 3) & (F.col("sd") > 0) & (F.abs(z) >= Z_THRESHOLD))
        .select(
            "event_type",
            F.col("h").alias("hour_start"),
            "n",
            F.round("mu", 4).alias("slot_mean"),
            F.round(z, 4).alias("z"),
        )
        .orderBy("event_type", "hour_start")
    )
