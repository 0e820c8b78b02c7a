"""Ingest-robustness semantics: exact quarantine accounting for the
malformed-CSV audit, and byte fidelity of the binary-file scan."""

from __future__ import annotations

from desdb_spark.sources import ingest_ext
from tests.conftest import SF_DIR


def test_csv_malformed_quarantine_counts(spark):
    r = ingest_ext.source_csv_malformed_audit(spark, SF_DIR).collect()[0]
    # 50 good rows + 3 planted: wrong-arity and bad-number rows are
    # quarantined; the bare "," parses as (null, null) — valid nulls,
    # NOT corrupt (CSV empty fields are legal). Nothing is lost:
    # valid + quarantined == total.
    assert r.n_rows == 53
    assert r.n_quarantined == 2
    assert r.n_valid == 51
    assert r.n_valid + r.n_quarantined == r.n_rows
    # DROPMALFORMED silently discards exactly the quarantined rows.
    assert r.n_after_dropmalformed == r.n_valid


def test_binaryfile_scan_matches_planted_bytes(spark):
    r = ingest_ext.source_binaryfile_scan(spark, SF_DIR).collect()[0]
    assert r.n_files == ingest_ext._BF_DOCS
    assert r.total_bytes > 0
