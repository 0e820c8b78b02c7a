"""Property pins for rows-only operators (VERDICT r6 item 5): every op
the driver can only rows-check carries a pytest asserting its strongest
checkable property — exact totals recomputed through public expressions,
engine-reproducible partition hashing, error bounds for sketches — so
"rows-only" never degrades to "row count only". Each test here is named
in SURVEY §2C's evidence map (tools/gen_survey_status.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_diag_partition_balance_matches_public_hash(spark):
    """The op measures engine-internal partition assignment, but Spark's
    HashPartitioning IS pmod(murmur3, n) — the same function exposed as
    F.hash — so every reported number is exactly recomputable from
    public expressions. Pins the full row, not just its shape."""
    from desdb_spark.operators.diagnostics import diag_partition_balance

    out = diag_partition_balance(spark, SF_DIR).collect()[0]
    li = load_table(spark, SF_DIR, "lineitem")
    exp = (
        li.select(F.pmod(F.hash("l_orderkey"), F.lit(32)).alias("pid"))
        .groupBy("pid")
        .agg(F.count("*").alias("rows"))
        .agg(
            F.count("*").alias("np"),
            F.sum("rows").alias("tot"),
            F.min("rows").alias("mn"),
            F.max("rows").alias("mx"),
        )
        .collect()[0]
    )
    assert out.n_partitions == exp.np
    assert out.total_rows == exp.tot == li.count()
    assert out.min_rows == exp.mn
    assert out.max_rows == exp.mx
    avg = exp.tot / exp.np
    assert abs(out.avg_rows - round(avg, 2)) < 1e-9
    assert abs(out.skew_ratio - round(exp.mx / avg, 4)) < 1e-9


def test_diag_file_layout_pins_totals(spark):
    """File counts are fs-layout-specific, but totals must equal the
    table counts exactly and the per-file extrema must bracket them."""
    from desdb_spark.operators.diagnostics import diag_file_layout

    rows = {r.table: r for r in diag_file_layout(spark, SF_DIR).collect()}
    assert set(rows) == {"orders", "lineitem", "documents", "events"}
    for name, r in rows.items():
        t = load_table(spark, SF_DIR, name)
        assert r.total_rows == t.count(), name
        n_files = t.select(F.input_file_name()).distinct().count()
        assert r.n_files == n_files, name
        assert 1 <= r.min_rows_per_file <= r.max_rows_per_file
        assert r.min_rows_per_file * r.n_files <= r.total_rows
        assert r.total_rows <= r.max_rows_per_file * r.n_files


def test_schema_describe_pins_lineitem_schema(spark):
    """The describe output is pinned to the exact fixture schema — a
    silent fixture or reader drift (the r4 TIMESTAMP_NTZ class) fails
    here before it fails a driver round."""
    from desdb_spark.operators.scans import schema_describe

    got = [
        (r.col_name, r.data_type, r.nullable)
        for r in schema_describe(spark, SF_DIR).collect()
    ]
    assert got == [
        ("l_orderkey", "bigint", True),
        ("l_partkey", "bigint", True),
        ("l_suppkey", "bigint", True),
        ("l_linenumber", "int", True),
        ("l_quantity", "double", True),
        ("l_extendedprice", "double", True),
        ("l_discount", "double", True),
        ("l_tax", "double", True),
        ("l_returnflag", "string", True),
        ("l_linestatus", "string", True),
        ("l_shipdate", "timestamp_ntz", True),
    ]


def test_ann_recall_report_consistency_and_floor(spark):
    """The recall report's columns must be internally consistent
    (evaluated ⊆ vectors, matches ≤ evaluated) and the IVF tier must
    clear a recall floor on the fixture — the deterministic planted-set
    bar, not a flaky sample. (The ratio itself left the frame in r13:
    integers only in the hashed report.)"""
    from desdb_spark.extensions.ann_eval import ann_recall_report

    r = ann_recall_report(spark, SF_DIR).collect()[0]
    assert 0 < r.n_evaluated <= r.n_vectors
    assert 0 <= r.exact_match <= r.sim_match <= r.n_evaluated
    # r13: the report carries exact integers only (a rounded float
    # ratio diverges cross-engine in the hash); derive recall here.
    recall_at_1 = r.sim_match / r.n_evaluated
    assert recall_at_1 >= 0.6  # measured 0.71 at sf0.001; IVF probes 1 cell


def test_agg_approx_count_distinct_error_bound(spark):
    """HLL estimate per group within 3·rsd of the exact distinct count,
    over exactly the exact group set (rsd=0.02 at registration)."""
    from desdb_spark.operators.aggregates import agg_approx_count_distinct

    approx = {
        r.o_orderstatus: r.approx_uniq_cust
        for r in agg_approx_count_distinct(spark, SF_DIR).collect()
    }
    o = load_table(spark, SF_DIR, "orders")
    exact = {
        r.o_orderstatus: r.n
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 3 * 0.02 * n), (k, approx[k], n)


def test_source_filecatalog_scan_pins_catalog_contents(spark):
    """The custom DataSource must enumerate exactly the fixture parquet
    files (os.listdir ground truth), all non-empty, at depth 0."""
    import os

    from desdb_spark.registry import all_operators

    rows = all_operators()["source_filecatalog_scan"].fn(spark, SF_DIR).collect()
    got = {os.path.basename(r.path): r for r in rows}
    disk = {f for f in os.listdir(SF_DIR) if f.endswith(".parquet")}
    assert set(got) == disk
    for f, r in got.items():
        assert r.non_empty and r.depth == 0, f
