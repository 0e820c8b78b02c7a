"""Custom Python DataSource writer: commit manifest integrity and
repeat-invocation consistency."""

from __future__ import annotations

import os
import tempfile

from desdb_spark.sources.pyds_sink import sink_python_datasource
from tests.conftest import SF_DIR


def test_writer_commit_manifest_and_idempotency(spark, tables):
    (first,) = sink_python_datasource(spark, SF_DIR).collect()
    assert first.n_rows == tables["orders"].count()

    out = os.path.join(
        tempfile.gettempdir(),
        f"desdb_kvtext_{spark.sparkContext.applicationId}",
    )
    manifest = os.path.join(out, "_MANIFEST")
    assert os.path.exists(manifest)
    entries = [
        ln.strip().split("\t") for ln in open(manifest) if ln.strip()
    ]
    # every manifest entry names an existing file with the declared rows
    total = 0
    for fname, rows in entries:
        path = os.path.join(out, fname)
        assert os.path.exists(path), fname
        n = sum(1 for _ in open(path))
        assert n == int(rows), fname
        total += n
    assert total == first.n_rows

    # a second run in the same session must produce the identical result
    (second,) = sink_python_datasource(spark, SF_DIR).collect()
    assert (second.n_rows, second.n_orders, second.sum_cents, second.n_statuses) == (
        first.n_rows,
        first.n_orders,
        first.sum_cents,
        first.n_statuses,
    )
