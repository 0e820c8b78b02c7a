"""Round-8: cross-table transactional snapshots — a transaction log
whose entries name ONE version per table ({orders: v, lineitem: v}),
advanced by a single pointer write. Readers resolve the latest txn and
read every table at its named version, so a fact table and its
children always join against each other's matching snapshot — the
multi-table atomicity a per-table manifest cannot give (and the reason
catalog layers like Iceberg's REST catalog / Nessie exist; Delta is
single-table by design, all public knowledge).

The crash-safety property is structural: data files and even per-table
manifests may be written and then ORPHANED by a crash before the txn
pointer advances; readers never see them, because the pointer is the
only thing that publishes. tests/test_lake_txn.py pins exactly that —
a stray post-txn manifest write changes nothing a txn reader observes.

Hash gate: both transactions' order↔lineitem join aggregates must
equal DuckDB joining the source tables under the same pivot split —
txn1's isolation from the append AND txn2's completeness, with
referential integrity (no orphan lines) implied by the counts.

Scale shape: a txn entry is O(#tables) bytes; reads plan from explicit
file lists per table exactly as single-table time travel does; the
join itself is an ordinary co-keyed sort-merge the optimizer handles.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table
from desdb_spark.sources.sinks import _stage_dir
from desdb_spark.sources.time_travel import read_as_of, write_version

PIVOT_DATE = "1998-01-01"


def commit_txn(root: str, txn_id: int, versions: dict) -> None:
    """Publish {table: version} as transaction ``txn_id`` — one file
    write is the whole commit."""
    os.makedirs(os.path.join(root, "txn"), exist_ok=True)
    with open(os.path.join(root, "txn", f"t{txn_id}.json"), "w") as fh:
        json.dump({"txn": txn_id, "versions": versions}, fh)


def get_txn(root: str, txn_id: int) -> dict:
    with open(os.path.join(root, "txn", f"t{txn_id}.json")) as fh:
        return json.load(fh)


def latest_txn(root: str) -> dict:
    d = os.path.join(root, "txn")
    return get_txn(root, max(int(f[1:-5]) for f in os.listdir(d)))


def read_txn_table(spark: SparkSession, root: str, txn: dict, table: str):
    return read_as_of(spark, os.path.join(root, table), txn["versions"][table])


def build_txn_tables(spark: SparkSession, sf_dir: str) -> str:
    """orders + lineitem as manifest tables under one txn log: txn1 =
    both tables' pre-pivot halves, txn2 = both appended to full.
    Returns the txn root."""
    root = _stage_dir(spark, "txn_root")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("k"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        "o_orderdate",
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("bigint").alias("k"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    pre_o = o.where(F.col("o_orderdate") < PIVOT_DATE)
    post_o = o.where(F.col("o_orderdate") >= PIVOT_DATE)
    # pre_keys is ~90% of orders' keys at this pivot — NOT a broadcast
    # side. A plain semi/anti join lets the optimizer pick sort-merge.
    pre_keys = pre_o.select("k")
    pre_l = li.join(pre_keys, on="k", how="left_semi")
    post_l = li.join(pre_keys, on="k", how="left_anti")

    write_version(pre_o.select("k", "cents"), os.path.join(root, "orders"), 1)
    write_version(pre_l, os.path.join(root, "lineitem"), 1)
    commit_txn(root, 1, {"orders": 1, "lineitem": 1})
    write_version(post_o.select("k", "cents"), os.path.join(root, "orders"), 2)
    write_version(post_l, os.path.join(root, "lineitem"), 2)
    commit_txn(root, 2, {"orders": 2, "lineitem": 2})
    return root


@register(
    "source_txn_snapshot_join",
    oracle=f"""
        SELECT CAST(1 AS BIGINT) AS txn,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate < DATE '{PIVOT_DATE}'
        UNION ALL
        SELECT CAST(2 AS BIGINT),
               CAST(count(DISTINCT o_orderkey) AS BIGINT),
               CAST(count(*) AS BIGINT),
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ORDER BY txn
    """,
    group="lake_txn",
)
def source_txn_snapshot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read BOTH transactions' (orders, lineitem) snapshot pairs via the
    txn log and aggregate each pair's join — hashed against DuckDB
    splitting the source tables at the same pivot, so every table reads
    at the version its transaction named: a reader mixing txn1 orders
    with txn2 lineitem (the bug the txn pointer exists to prevent)
    inflates n_lines and flips the hash.
    """
    root = build_txn_tables(spark, sf_dir)

    def txn_agg(txn_id: int) -> DataFrame:
        txn = get_txn(root, txn_id)
        o = read_txn_table(spark, root, txn, "orders")
        li = read_txn_table(spark, root, txn, "lineitem")
        j = li.join(o, on="k")
        return j.agg(
            F.lit(txn_id).cast("bigint").alias("txn"),
            F.countDistinct("k").cast("bigint").alias("n_orders"),
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum("qty").cast("bigint").alias("sum_qty"),
        )

    return txn_agg(1).unionByName(txn_agg(2)).orderBy("txn")
