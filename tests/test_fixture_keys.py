"""Fixture key-uniqueness pins (ADVICE r16): the r16 decontamination
optimization dropped two ``.distinct()`` calls whose no-op proofs lean on
``documents.doc_id`` being a unique key, and the dedup tier's digest/class
stars (``dup_edges``) assume the same. The fixture generator guarantees it
(doc_id is the row index); this test makes the latent invariant explicit
so a future fixture change reds HERE instead of silently double-counting
in ops whose oracles happen to keep their own DISTINCTs."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.session import load_table
from tests.conftest import SF_DIR

#: (table, key column) pairs ops treat as primary keys.
KEYED_TABLES = [
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]


def test_fixture_key_columns_are_unique(spark):
    for table, key in KEYED_TABLES:
        t = load_table(spark, SF_DIR, table)
        n, nd = t.agg(
            F.count("*").alias("n"), F.countDistinct(key).alias("nd")
        ).first()
        assert n == nd and n > 0, f"{table}.{key}: {n} rows, {nd} distinct"
