"""Planted-contamination test for the verbatim-substring arm: a
synthetic corpus with KNOWN contamination (one probe copied verbatim
into three training docs, one probe appearing only in its source)
must produce exact hit counts — the anchor-token blocking is claimed
lossless, so no planted hit may be missed and no clean doc may count.
The fixture-level differential (selfcheck) proves DuckDB parity; this
proves the counts mean what the docstring says."""

from __future__ import annotations

from desdb_spark.extensions.decontam_ext import (
    EVAL_STRIDE,
    MIN_PROBE_DOC_CHARS,
    PROBE_LEN,
    PROBE_START,
    docs_eval_substring_contamination,
)


def _mk_text(seed: str, n_tokens: int = 30) -> str:
    return " ".join(f"{seed}{i}" for i in range(n_tokens))


def test_planted_contamination_counts_exact(spark, tmp_path):
    src25 = _mk_text("alpha")
    src50 = _mk_text("omega")
    assert len(src25) >= MIN_PROBE_DOC_CHARS
    # The op's probe definition: 1-based substring(text, START, LEN).
    probe25 = src25[PROBE_START - 1 : PROBE_START - 1 + PROBE_LEN]
    probe50 = src50[PROBE_START - 1 : PROBE_START - 1 + PROBE_LEN]
    assert " " in probe25.strip(), "probe must span interior tokens"

    docs = [
        (25, src25),                                   # eval doc (25 % 25 == 0)
        (50, src50),                                   # eval doc, self-hit only
        # three contaminated training docs carry probe25 verbatim
        (1, f"front1 {probe25} tail1"),
        (2, f"{probe25} tail2 tail2b"),
        (3, f"front3 front3b {probe25}"),
        # clean docs sharing vocabulary-ish tokens but not the probe
        (4, _mk_text("beta")),
        (6, _mk_text("gamma")),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id bigint, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")

    rows = {
        r.eval_id: r
        for r in docs_eval_substring_contamination(spark, sf_dir).collect()
    }
    assert set(rows) == {25, 50}

    r25 = rows[25]
    assert r25.n_hits == 4, "self + three planted copies"
    assert r25.cross_doc_hits == 3
    assert r25.first_hit_doc == 1

    r50 = rows[50]
    assert r50.n_hits == 1 and r50.cross_doc_hits == 0
    assert r50.first_hit_doc == 50

    # brute-force cross-check: substring containment over the raw texts
    for eval_id, probe in ((25, probe25), (50, probe50)):
        expect = sorted(i for i, t in docs if probe in t)
        assert rows[eval_id].n_hits == len(expect)
        assert rows[eval_id].first_hit_doc == expect[0]


def test_planted_eval_docs_below_scope_are_excluded(spark, tmp_path):
    """Probes without a usable interior token (short texts) are scoped
    OUT of this op (the char-gram companion covers them) — they must be
    absent from the report, not silently zero."""
    docs = [
        (25, "tiny text"),                 # < MIN_PROBE_DOC_CHARS
        (50, _mk_text("delta")),           # valid eval doc
        (7, _mk_text("epsilon")),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id bigint, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    rows = {
        r.eval_id: r
        for r in docs_eval_substring_contamination(spark, sf_dir).collect()
    }
    assert set(rows) == {50}
    assert rows[50].n_hits == 1 and rows[50].cross_doc_hits == 0
