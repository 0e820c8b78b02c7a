"""Short-probe (char-gram) decontamination: planted-floor recall and
complementarity with the token-anchor op's scope."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.extensions.decontam_short import (
    GRAM,
    PROBE_STRIDE,
    _MIN_DOC_CHARS,
    docs_decontam_short_probes,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_short_probe_planted_floor(spark):
    """Every space-free probe hits its planted synthetic twin (exactly
    one non-cross hit each), proving the gram-anchor blocking found the
    verbatim containment the token-anchor op cannot see (the probes have
    zero interior whitespace tokens by construction)."""
    rows = docs_decontam_short_probes(spark, SF_DIR).collect()
    d = load_table(spark, SF_DIR, "documents")
    expected_probes = (
        d.where(
            (F.col("doc_id") % PROBE_STRIDE == 0)
            & (F.length("text") >= _MIN_DOC_CHARS)
        )
        .select(
            F.regexp_replace(F.substring("text", 1, 48), " ", "").alias("b")
        )
        .where(F.length("b") >= GRAM)
        .count()
    )
    assert len(rows) == expected_probes  # every probe surfaced
    for r in rows:
        assert r.n_hits - r.cross_hits == 1  # the planted twin, exactly once
