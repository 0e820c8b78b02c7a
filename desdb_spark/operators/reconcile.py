"""Round-6 batch-5 snapshot reconciliation (distributed table diff).

The operational question every warehouse eventually answers at 3am:
"these two snapshots of the same table should agree — where do they
differ, and how?" The scalable answer is not row-by-row comparison in a
driver loop but a keyed full-outer join of row fingerprints: added rows
(key only in B), removed rows (key only in A), changed rows (key in
both, fingerprint differs) — the anti-entropy pattern behind backup
verification, replication audit, and migration cutover checks.

The registered op derives snapshot B from snapshot A (orders) by a
deterministic set of mutations — drop keys ≡ 0 (mod 97), bump
o_totalprice on keys ≡ 1 (mod 97), inject new keys above the max — so
both engines construct identical snapshots and the diff report is
hash-checkable end to end.

Reference parity: desdb had no reconciliation surface (SURVEY.md §2A —
reconstructed); new engine capability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


def snapshot_diff(
    a: DataFrame, b: DataFrame, key: str, fingerprint: Column
) -> DataFrame:
    """Keyed diff of two snapshots: one row per differing key with a
    status in {added, removed, changed}. ``fingerprint`` is evaluated
    on each side's columns; rows whose key exists on both sides with
    equal fingerprints are dropped (the common case — at scale the
    overwhelming majority, so the shuffle's output is tiny even though
    its input is two full tables; with both snapshots bucketed by key
    the join is co-located and shuffle-free)."""
    fa = a.select(F.col(key).alias("k"), fingerprint.alias("fp_a"))
    fb = b.select(F.col(key).alias("k"), fingerprint.alias("fp_b"))
    j = fa.join(fb, "k", "full_outer")
    return j.select(
        "k",
        F.when(F.col("fp_a").isNull(), "added")
        .when(F.col("fp_b").isNull(), "removed")
        .when(F.col("fp_a") != F.col("fp_b"), "changed")
        .alias("status"),
    ).where(F.col("status").isNotNull())


@register(
    "diff_snapshot_reconcile",
    oracle="""
        WITH a AS (
            SELECT o_orderkey AS k,
                   CAST(o_custkey AS VARCHAR) || '|' ||
                   CAST(round(o_totalprice, 2) AS VARCHAR) || '|' ||
                   o_orderstatus AS fp
            FROM orders
        ), b AS (
            SELECT k,
                   CASE WHEN k % 97 = 1
                        THEN regexp_replace(fp, '^([0-9]+)[|][^|]*',
                                            '\\1|bumped')
                        ELSE fp END AS fp
            FROM a WHERE k % 97 <> 0
            UNION ALL
            SELECT (SELECT max(o_orderkey) FROM orders) + s AS k,
                   'new' AS fp
            FROM generate_series(1, 5) t(s)
        ), j AS (
            SELECT coalesce(a.k, b.k) AS k, a.fp AS fp_a, b.fp AS fp_b
            FROM a FULL OUTER JOIN b ON a.k = b.k
        )
        SELECT CASE WHEN fp_a IS NULL THEN 'added'
                    WHEN fp_b IS NULL THEN 'removed'
                    ELSE 'changed' END AS status,
               CAST(count(*) AS BIGINT) AS n_rows,
               min(k) AS min_key, max(k) AS max_key
        FROM j
        WHERE fp_a IS NULL OR fp_b IS NULL OR fp_a <> fp_b
        GROUP BY 1
    """,
    group="reconcile",
)
def diff_snapshot_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two deterministic snapshots of orders and report per-status
    row counts with key ranges. Snapshot B = A minus keys ≡0 (mod 97)
    (→ 'removed'), with the fingerprint's price field rewritten on keys
    ≡1 (mod 97) (→ 'changed'), plus 5 injected keys past the max
    (→ 'added').

    Scale shape: fingerprints are computed scan-side (codegen string
    concat — at 100 TB you'd use xxhash64 of the packed row instead of
    a readable string; same plan shape), the full-outer join shuffles
    (key, fingerprint) pairs only — never payload columns — and the
    report aggregate reduces to three rows. Equal rows are filtered
    BEFORE the aggregate, so the join's output cardinality is the
    number of differences, not the table size.
    """
    o = load_table(spark, sf_dir, "orders")
    fp = F.concat_ws(
        "|",
        F.col("o_custkey").cast("string"),
        F.round("o_totalprice", 2).cast("string"),
        F.col("o_orderstatus"),
    )
    a = o.select(F.col("o_orderkey").alias("k"), fp.alias("fp"))
    max_key = o.agg(F.max("o_orderkey")).first()[0]
    mutated = a.where(F.col("k") % 97 != 0).select(
        "k",
        F.when(
            F.col("k") % 97 == 1,
            F.regexp_replace(F.col("fp"), r"^([0-9]+)\|[^|]*", r"$1|bumped"),
        )
        .otherwise(F.col("fp"))
        .alias("fp"),
    )
    injected = spark.range(1, 6).select(
        (F.lit(max_key) + F.col("id")).alias("k"), F.lit("new").alias("fp")
    )
    b = mutated.unionAll(injected)
    d = snapshot_diff(
        a.withColumnRenamed("fp", "v"),
        b.withColumnRenamed("fp", "v"),
        "k",
        F.col("v"),
    )
    return d.groupBy("status").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )
