"""Round-7: inline pipeline observability via ``DataFrame.observe`` —
Spark's zero-cost data-quality metrics channel. A production job doesn't
run a second pass to know what it just processed: ``observe`` attaches
named aggregate expressions to a point IN the plan, the metrics
accumulate on the executors while the main action runs, and the driver
reads them from the query listener afterwards. This is the engine-native
version of the row-count/null-count side outputs every ingest pipeline
bolts on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table, values_frame


@register(
    "scan_observed_metrics",
    # The observed metrics are exact aggregates of the rows that flowed
    # past the observation point, so DuckDB computing the same
    # aggregates over the same filter IS the oracle.
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS null_prices,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               CAST(max(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS max_cents
        FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    group="observability",
)
def scan_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run a filtered scan with an ``observe`` checkpoint and return the
    metrics the observation recorded — row count, null count, exact
    cents total and maximum — as a one-row frame (observe forbids
    DISTINCT aggregates, so cardinality metrics belong to a follow-up
    query, not the inline channel).

    Scale shape: the metrics are computed as accumulator-style partial
    aggregates inside the SAME stage as the observed scan (visible as a
    CollectMetrics node; no extra job, no second read). The terminal
    action here is a count() purely to drive the pipeline — in
    production the action is the real write, and the metrics ride along
    free. The returned frame is built from the observation's driver-side
    dict (four scalars), exactly the fitted-parameter pattern.
    """
    from pyspark.sql import Observation

    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    obs = Observation("ingest_audit")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").isNull().cast("bigint")).alias("null_prices"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
            "sum_cents"
        ),
        F.max(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
            "max_cents"
        ),
    )
    observed.count()  # the driving action; a real job's write goes here
    m = obs.get
    # r17: inline VALUES emit (see values_frame).
    return values_frame(
        spark,
        [
            (
                int(m["n_rows"]),
                int(m["null_prices"]),
                int(m["sum_cents"]),
                int(m["max_cents"]),
            )
        ],
        "n_rows bigint, null_prices bigint, sum_cents bigint, max_cents bigint",
    )
