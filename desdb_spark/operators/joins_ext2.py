"""Round-6 batch-3 join strategies: runtime Bloom-filter pruning and the
bucketed interval-overlap join.

Reference parity: desdb exposed only equi-joins through SQL passthrough
(SURVEY.md §2A A1/A6 — reconstructed); these two rows extend the join
surface with the strategies a 100 TB deployment actually needs: shuffle
joins whose probe side is pre-pruned by a Bloom filter built from the
build side, and interval-overlap joins that never degenerate into a
cartesian product.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@contextmanager
def _scoped_confs(spark: SparkSession, confs: dict[str, str]):
    """Set session confs for the duration of a block, restoring the prior
    values (or unsetting) afterwards — the same discipline as
    plans/lineage.py's CTE row-limit handling."""
    prior: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            prior[k] = spark.conf.get(k)
        except Exception:
            prior[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in prior.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def bloom_pruned_join(
    spark: SparkSession, fact: DataFrame, dim: DataFrame, on: list[str]
) -> DataFrame:
    """Shuffle join evaluated under Spark's runtime Bloom-filter injection
    (`spark.sql.optimizer.runtime.bloomFilter.*`): the optimizer builds a
    Bloom filter from the (filtered) build side and applies
    `might_contain` at the probe side's scan, so at 100 TB the probe
    shuffle carries only rows that can possibly match. Results are exact
    — Bloom false positives are removed by the join itself.

    The joined result is materialized eagerly (``localCheckpoint``) so
    the plan is optimized while the forcing confs are in scope; the
    session confs are restored before returning. At fixture scale the
    checkpoint holds a few thousand rows; at 100 TB you would simply run
    with the (default-on) Bloom conf instead of checkpointing.
    """
    joined = fact.join(dim, on=on)
    with _scoped_confs(
        spark,
        {
            # Force a shuffle join (broadcast would not need the filter)…
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # …and drop the size thresholds so injection fires on fixtures.
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "500MB",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        },
    ):
        return joined.localCheckpoint(eager=True)


@register(
    "join_bloom_runtime_filter",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
               o.o_orderpriority
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
          AND o.o_totalprice > 150000
    """,
    group="joins_ext2",
)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ selectively-filtered orders under runtime Bloom-filter
    injection: the orders filter keeps a small fraction of keys, so the
    injected `might_contain(l_orderkey)` prunes most of lineitem before
    its shuffle. tests/test_plans.py asserts the optimized plan actually
    contains the Bloom (`might_contain`) under these confs.

    Scale shape: this is THE pattern for 100 TB fact ⋈ filtered-dim
    shuffle joins — without the filter the fact side ships every row to
    the shuffle; with it, shuffle volume tracks the join's selectivity.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 150000)
        )
        .select("o_orderkey", "o_orderpriority")
    )
    out = bloom_pruned_join(
        spark, li.withColumnRenamed("l_orderkey", "o_orderkey"), orders, ["o_orderkey"]
    )
    return out.select(
        F.col("o_orderkey").alias("l_orderkey"),
        "l_linenumber",
        "l_extendedprice",
        "o_orderpriority",
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    bucket_seconds: int,
    l_start: str = "l_start",
    l_end: str = "l_end",
    r_start: str = "r_start",
    r_end: str = "r_end",
) -> DataFrame:
    """Overlap join of two interval tables ([start, end), end exclusive)
    without a cartesian/theta plan: each interval explodes into the
    fixed-width time buckets it covers, candidates come from a bucket
    equi-join, the true overlap predicate filters, and ``dropDuplicates``
    collapses pairs that met in several buckets.

    Scale shape: shuffle volume is Σ intervals × buckets-covered — linear
    for bounded interval lengths — versus the quadratic blow-up of a
    BroadcastNestedLoop theta join. Pick ``bucket_seconds`` near the
    typical interval length so most intervals cover ≤2 buckets.
    """
    def buckets(start: str, end: str):
        # sequence() over epoch-bucket ordinals covers [start, end) even
        # when the interval straddles bucket boundaries.
        return F.sequence(
            (F.col(start).cast("long") / bucket_seconds).cast("long"),
            ((F.col(end).cast("long") - 1) / bucket_seconds).cast("long"),
        )

    lb = left.withColumn("bucket", F.explode(buckets(l_start, l_end)))
    rb = right.withColumn("bucket", F.explode(buckets(r_start, r_end)))
    return (
        lb.join(rb, "bucket")
        .where((F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end)))
        .drop("bucket")
        .dropDuplicates()
    )


@register(
    "join_interval_overlap",
    oracle="""
        WITH g AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
            SELECT user_id, ts,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM g
        ), sessions AS (
            SELECT user_id, min(ts) AS l_start,
                   max(ts) + INTERVAL '30 minutes' AS l_end
            FROM s GROUP BY user_id, sess_id
        ), incidents AS (
            SELECT event_id,
                   ts - INTERVAL '15 minutes' AS r_start,
                   ts + INTERVAL '15 minutes' AS r_end
            FROM events WHERE value > 400
        )
        SELECT se.user_id, se.l_start AS session_start,
               count(*) AS n_incidents
        FROM sessions se
        JOIN incidents i
          ON se.l_start < i.r_end AND i.r_start < se.l_end
        GROUP BY se.user_id, se.l_start
    """,
    group="joins_ext2",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many high-value incidents (±15 min around any value>400 event,
    from ANY user) overlapped each user session — an interval-overlap
    join between two derived interval tables, planned as a bucketed
    equi-join (1-hour buckets) instead of the theta join the oracle runs.

    Scale shape: sessions are bounded by the 30-min gap rule and
    incidents are 30 min wide, so each interval covers O(1) buckets; the
    oracle's theta form would be a nested-loop at scale.
    """
    ev = load_table(spark, sf_dir, "events")
    sessions = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("cnt"))
        .select(
            "user_id",
            F.col("session_window.start").alias("l_start"),
            F.col("session_window.end").alias("l_end"),
        )
    )
    incidents = ev.where(F.col("value") > 400).select(
        "event_id",
        (F.col("ts") - F.expr("INTERVAL 15 MINUTES")).alias("r_start"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("r_end"),
    )
    pairs = interval_overlap_join(sessions, incidents, bucket_seconds=3600)
    return (
        pairs.groupBy("user_id", F.col("l_start").alias("session_start"))
        .agg(F.count("*").alias("n_incidents"))
    )
