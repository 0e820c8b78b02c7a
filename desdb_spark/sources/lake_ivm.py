"""Round-8: incremental materialized-view maintenance over the manifest
table — the production pattern the change data feed exists FOR: a
grouped aggregate is refreshed v1→v2 by applying only the CDF delta
(+after-images, −before-images), never rescanning the table.

For self-maintainable aggregates (COUNT, SUM — and anything derived
from them: AVG, variance via sufficient statistics) the delta algebra
is exact: new = old + agg(added) − agg(removed). Unchanged groups ride
through a full-outer join with zero-coalesced deltas.

Scale shape: the refresh reads ONLY the files the manifest diff names
(the rewritten + inserted fraction), aggregates them once, and joins
group-grained deltas against the group-grained view — cost ∝ changed
rows + |view|, while the full recompute the hash gate compares against
is ∝ |table|. That asymmetry is the whole point, and the differential
gate proves the two are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.sources.lake_dml import (
    MERGED_STATE_CTE,
    build_merged_table,
    read_or_empty,
)
from desdb_spark.sources.time_travel import read_as_of, read_manifest

#: View grain: key modulo this many buckets.
N_BUCKETS = 50


def _bucket_agg(df: DataFrame) -> DataFrame:
    return (
        df.withColumn("bucket", (F.col("k") % N_BUCKETS).cast("bigint"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
    )


@register(
    "source_incremental_view_refresh",
    oracle=MERGED_STATE_CTE
    + f"""
        SELECT CAST(k % {N_BUCKETS} AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM merged GROUP BY 1 ORDER BY 1
    """,
    group="lake_ivm",
)
def source_incremental_view_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a per-bucket (COUNT, SUM) view across the v1→v2 merge by
    DELTA APPLICATION ONLY: the before/after images come from the
    manifest diff's removed/added files, their group-grained signed
    deltas full-outer-join the v1 view, and the result must hash equal
    to DuckDB recomputing the view from the merged table in full — the
    incremental path and the full recompute agreeing to the bit at
    every group.
    """
    root, *_ = build_merged_table(spark, sf_dir)
    view_v1 = _bucket_agg(read_as_of(spark, root, 1))

    v1 = {e["path"] for e in read_manifest(root, 1)}
    v2 = {e["path"] for e in read_manifest(root, 2)}
    pre = read_or_empty(spark, list(v1 - v2)).select("k", "cents")
    post = read_or_empty(spark, list(v2 - v1)).select("k", "cents")
    delta_rows = post.exceptAll(pre).withColumn("sign", F.lit(1)).unionByName(
        pre.exceptAll(post).withColumn("sign", F.lit(-1))
    )
    delta = (
        delta_rows.withColumn("bucket", (F.col("k") % N_BUCKETS).cast("bigint"))
        .groupBy("bucket")
        .agg(
            F.sum("sign").cast("bigint").alias("d_n"),
            F.sum(F.col("sign") * F.col("cents")).cast("bigint").alias("d_cents"),
        )
    )
    refreshed = (
        view_v1.join(delta, on="bucket", how="full_outer")
        .select(
            "bucket",
            (F.coalesce("n_rows", F.lit(0)) + F.coalesce("d_n", F.lit(0)))
            .cast("bigint")
            .alias("n_rows"),
            (
                F.coalesce("sum_cents", F.lit(0))
                + F.coalesce("d_cents", F.lit(0))
            )
            .cast("bigint")
            .alias("sum_cents"),
        )
        .where(F.col("n_rows") > 0)
        .orderBy("bucket")
    )
    return refreshed
