"""Lake layout semantics: partition pruning actually prunes; bucketed
joins actually skip the shuffle (SURVEY.md §4)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from desdb_spark.sources import lake


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes(spark, tables):
    path = tempfile.mkdtemp(prefix="lake_part_")
    try:
        reader = lake.write_partitioned_by_date(
            tables["orders"], path, "o_orderdate", granularity="year"
        )
        pruned = reader.where(F.col("o_orderdate_year") == "1996-01-01")
        plan = _plan(pruned)
        # The scan must carry the predicate as a PartitionFilter (directory
        # pruning at planning time), not a post-scan data filter.
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert pf and "o_orderdate_year" in pf[0], plan
        n_all = reader.count()
        n_1996 = pruned.count()
        assert 0 < n_1996 < n_all
        # And the pruned count equals the real 1996 subset.
        expected = (
            tables["orders"].where(F.year("o_orderdate") == 1996).count()
        )
        assert n_1996 == expected
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_bucketed_join_skips_shuffle(spark, tables):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    try:
        bo = lake.write_bucketed_table(
            tables["orders"].select("o_orderkey", "o_totalprice"),
            "b_orders",
            "o_orderkey",
            num_buckets=4,
        )
        bl = lake.write_bucketed_table(
            tables["lineitem"].select("l_orderkey", "l_quantity"),
            "b_lineitem",
            "l_orderkey",
            num_buckets=4,
        )
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).where(
            F.col("l_quantity") > 0
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _plan(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        assert "SortMergeJoin" in plan
        # Co-located buckets: no exchange feeds the join.
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_analyze_table_stats_visible(spark, tables):
    spark.sql("DROP TABLE IF EXISTS stats_nation")
    try:
        tables["nation"].write.mode("overwrite").saveAsTable("stats_nation")
        lake.analyze_table(spark, "stats_nation", ["n_nationkey"])
        desc = spark.sql("DESCRIBE EXTENDED stats_nation").collect()
        stats = [r for r in desc if r.col_name == "Statistics"]
        assert stats and "rows" in stats[0].data_type
    finally:
        spark.sql("DROP TABLE IF EXISTS stats_nation")
