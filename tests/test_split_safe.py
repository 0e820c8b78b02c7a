"""Leakage-safe split semantics (the hash proves cross-engine parity;
this pins the zero-leak guarantee and that the guarantee is non-vacuous
— the doc-grain split DOES leak on the same corpus)."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.extensions.dedup_components import dup_edges
from desdb_spark.extensions.split_safe import (
    assign_cluster_split,
    split_cluster_safe,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def _doc_grain_split(d):
    b = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    return d.select(
        "doc_id",
        F.when(b < "cc", F.lit("train"))
        .when(b < "e6", F.lit("valid"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def test_no_duplicate_pair_straddles_splits(spark):
    d = load_table(spark, SF_DIR, "documents")
    edges = dup_edges(d)
    lab = assign_cluster_split(d)
    a = lab.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    b = lab.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    leaked = (
        edges.join(a, "id_a").join(b, "id_b").where(F.col("sa") != F.col("sb"))
    )
    assert leaked.count() == 0


def test_doc_grain_split_leaks_on_this_corpus(spark):
    """The guarantee must be non-vacuous: hashing doc_id independently
    tears at least one duplicate pair across splits (the fixture plants
    exact duplicates — FIXTURES.md documents table)."""
    d = load_table(spark, SF_DIR, "documents")
    edges = dup_edges(d)
    lab = _doc_grain_split(d)
    a = lab.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    b = lab.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    leaked = (
        edges.join(a, "id_a").join(b, "id_b").where(F.col("sa") != F.col("sb"))
    )
    assert leaked.count() > 0


def test_summary_is_consistent(spark):
    d = load_table(spark, SF_DIR, "documents")
    rows = {r.split: r for r in split_cluster_safe(spark, SF_DIR).collect()}
    assert set(rows) <= {"train", "valid", "test"}
    assert sum(r.n_docs for r in rows.values()) == d.count()
    # every doc belongs to exactly one cluster; cluster counts sum to
    # the number of distinct clusters
    lab = assign_cluster_split(d)
    assert sum(r.n_clusters for r in rows.values()) == (
        lab.select("cluster_id").distinct().count()
    )
    # the train share is roughly the 80% the cc-fence encodes (clusters
    # move in blocks, so allow wide slack at fixture scale)
    train_share = rows["train"].n_docs / d.count()
    assert 0.6 < train_share < 0.95
