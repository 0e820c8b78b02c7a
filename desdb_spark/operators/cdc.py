"""Round-6 batch-5 CDC log application (latest-wins with tombstones).

``merge_upsert_snapshot`` (operators/relational_ext6.py) applies ONE
delta batch; SCD2 (operators/temporal.py) keeps full history. The
remaining change-data-capture primitive is applying a whole ORDERED
change log — interleaved inserts, updates, and deletes, possibly many
per key — to reconstruct current state: latest sequence number wins,
and a trailing delete is a tombstone that removes the key entirely.
This is the compaction step every CDC-fed lakehouse table runs
(Debezium→merge pipelines, Hudi/Delta CDF apply — public patterns).

The log is derived deterministically from orders (insert for every
key; an update bumping the price for keys ≡0 mod 7; a tombstone for
keys ≡0 mod 13 — overlapping classes exercise update-then-delete), so
the reconstructed state is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


def apply_cdc_log(log: DataFrame, key: str, seq: str, op: str) -> DataFrame:
    """Collapse an (key, seq, op, payload...) change log to current
    state: per key keep the row with the highest ``seq`` (latest-wins),
    then drop keys whose final op is a delete. One window over the key
    partition — the log shuffles once on key, payload rides along, no
    join. At scale the log is usually already bucketed by key from the
    CDC sink, making even that shuffle co-located."""
    w = W.partitionBy(key).orderBy(F.col(seq).desc())
    latest = (
        log.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.where(F.col(op) != "D").drop(seq, op)


@register(
    "cdc_apply_tombstones",
    oracle="""
        WITH log AS (
            SELECT o_orderkey AS k, 1 AS seq, 'I' AS op,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
            FROM orders
            UNION ALL
            SELECT o_orderkey, 2, 'U',
                   (CAST(round(o_totalprice * 100, 0) AS BIGINT) * 11) // 10
            FROM orders WHERE o_orderkey % 7 = 0
            UNION ALL
            SELECT o_orderkey, 3, 'D', NULL
            FROM orders WHERE o_orderkey % 13 = 0
        ), latest AS (
            SELECT k, op, price_cents,
                   row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
            FROM log
        ), state AS (
            SELECT k, op, price_cents FROM latest WHERE rn = 1 AND op <> 'D'
        )
        SELECT op AS final_op,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(price_cents) AS BIGINT) AS total_cents
        FROM state GROUP BY op
    """,
    group="cdc",
)
def cdc_apply_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruct current state from a 3-wave CDC log over orders
    (insert all → update every 7th key's price +10% → tombstone every
    13th key) and report surviving-key counts and price totals per
    final op. Prices travel as integer CENTS (and the +10% bump is
    integer ·11÷10 floor division) so every value in the hashed result
    is exact — a float total at this row count sits close enough to
    rounding boundaries that the two engines' summation orders can
    legitimately straddle one. Keys divisible by both 7 and 13 exercise the
    update-then-delete path; their absence from the result is part of
    the hash.

    Scale shape: the log union is three pruned scans; the latest-wins
    window shuffles each key's handful of log rows once; tombstone
    filtering is a post-window predicate. No join anywhere — CDC apply
    is a per-key reduction, and expressing it as one keeps it linear at
    100 TB.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    k = F.col("o_orderkey").alias("k")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    inserts = o.select(
        k, F.lit(1).alias("seq"), F.lit("I").alias("op"),
        cents.alias("price_cents"),
    )
    updates = o.where(F.col("o_orderkey") % 7 == 0).select(
        k, F.lit(2).alias("seq"), F.lit("U").alias("op"),
        F.floor(cents * 11 / 10).cast("bigint").alias("price_cents"),
    )
    deletes = o.where(F.col("o_orderkey") % 13 == 0).select(
        k, F.lit(3).alias("seq"), F.lit("D").alias("op"),
        F.lit(None).cast("bigint").alias("price_cents"),
    )
    log = inserts.unionAll(updates).unionAll(deletes)
    w = W.partitionBy("k").orderBy(F.col("seq").desc())
    latest = (
        log.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .where(F.col("op") != "D")
    )
    return latest.groupBy(F.col("op").alias("final_op")).agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("price_cents").cast("bigint").alias("total_cents"),
    )
