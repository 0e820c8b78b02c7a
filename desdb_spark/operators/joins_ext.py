"""Join strategy extensions (round 5): the salted skew join as a
registered, driver-verified operator.

`salted_join` has lived as a library helper since round 2
(operators/joins.py:400) with pytest equivalence + skew-balance stress
tests; registering a query through it puts the whole salt→replicate→
equi-join→drop pipeline under the external DuckDB differential as well:
the oracle is the PLAIN join, so a green hash row is a proof that
salting is result-invariant end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "join_salted_skew",
    oracle="""
        SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
               round(sum(s_acctbal), 2) AS total_bal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    group="joins_ext",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier census per nation routed through the salted skew join:
    each supplier row gets a deterministic salt in [0, 8), nation is
    replicated 8 ways, and the join runs on (nationkey, salt) — the
    oracle is the unsalted join, so the driver's hash row certifies the
    rewrite changes nothing but the partitioning.

    Scale shape: salting splits each join key across 8 tasks, bounding
    the largest task at ~⅛ of the hottest key — the tool for power-law
    keys that exceed one executor, where AQE skew-split cannot help
    (it only splits observed shuffle partitions, and a broadcast-side
    hot key never shows it one). Cost: dim × 8 replication, fact-side
    narrow salt column. The skew-balance bound itself is asserted on a
    power-law fixture in tests/test_scale_round4.py.
    """
    # Imported lazily: a module-level import would pull operators.joins in
    # ahead of its _OP_MODULES slot and register its 10 ops inside the
    # driver window, displacing the never-checked ops this window exists
    # to cover.
    from desdb_spark.operators.joins import salted_join

    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = salted_join(
        s.withColumnRenamed("s_nationkey", "n_nationkey"), n, "n_nationkey", salt=8
    )
    return joined.groupBy("n_name").agg(
        F.count("*").alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )
