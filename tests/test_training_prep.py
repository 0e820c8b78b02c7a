"""Planted-data semantics for the training-prep ops (round 5).

The DuckDB differential proves Spark↔DuckDB agreement; these prove the
*intended semantics* where the right answer is known by construction:
packing never splits a doc and overshoots by at most one doc, splits are
disjoint+exhaustive+append-stable, the stratified sample is a pure
function of doc_id, and budget selection stops at the first doc that
starts past the budget.
"""

from __future__ import annotations

import pytest

from desdb_spark.extensions.training_prep import (
    PACK_TOKENS,
    corpus_mix_weights,
    docs_pack_sequences,
    docs_token_budget_select,
    sample_stratified_docs,
    split_train_valid_test,
)

from tests.conftest import SF_DIR


def _write_docs(spark, path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _doc(doc_id, n_tokens, lang="en", source="s0"):
    text = " ".join(["w"] * n_tokens)
    return (doc_id, text, lang, source, len(text))


def test_pack_contiguous_assignment(spark, tmp_path):
    """Docs of 200 tokens each against a 512 cap: packs are [0,1,2] for
    the first three docs (cum_before 0/200/400 < 512), then doc 4 starts
    pack 1 (cum_before 600). Assignment = floor(prefix_sum/cap) exactly."""
    rows = [_doc(i, 200) for i in range(1, 7)]  # 6 docs × 200 tokens
    _write_docs(spark, str(tmp_path), rows)
    out = {
        r.pack_id: (r.n_docs, r.pack_tokens)
        for r in docs_pack_sequences(spark, str(tmp_path)).collect()
    }
    # prefix sums: 0,200,400 → pack 0; 600,800 → pack 1; 1000 → pack 1?
    # floor(600/512)=1, floor(800/512)=1, floor(1000/512)=1 — docs 4,5,6.
    assert out == {0: (3, 600), 1: (3, 600)}


def test_pack_never_splits_and_overshoot_bounded(spark, tmp_path):
    """Every pack holds whole docs; fill exceeds the cap by less than one
    max-length doc; total tokens are conserved."""
    sizes = [300, 100, 450, 60, 512, 90, 200, 10, 470, 33]
    rows = [_doc(i, s) for i, s in enumerate(sizes, start=1)]
    _write_docs(spark, str(tmp_path), rows)
    packs = docs_pack_sequences(spark, str(tmp_path)).collect()
    assert sum(p.pack_tokens for p in packs) == sum(sizes)
    assert sum(p.n_docs for p in packs) == len(sizes)
    for p in packs:
        assert p.pack_tokens < PACK_TOKENS + max(sizes)


def test_split_disjoint_exhaustive_and_append_stable(spark, tmp_path):
    """Every doc lands in exactly one split, and appending new docs never
    reassigns an existing one (membership is a pure function of doc_id)."""
    rows = [_doc(i, 10, lang=("en" if i % 2 else "fr")) for i in range(1, 101)]
    _write_docs(spark, str(tmp_path), rows)
    before = split_train_valid_test(spark, str(tmp_path)).collect()
    assert sum(r.n_docs for r in before) == 100
    assert {r.split for r in before} <= {"train", "valid", "test"}

    sample_before = {
        r.doc_id for r in sample_stratified_docs(spark, str(tmp_path)).collect()
    }
    rows += [_doc(i, 10) for i in range(101, 151)]
    _write_docs(spark, str(tmp_path), rows)
    sample_after = {
        r.doc_id for r in sample_stratified_docs(spark, str(tmp_path)).collect()
    }
    assert sample_before <= sample_after  # append-only stability


def test_stratified_rates_differ_by_lang(spark):
    """On the real fixture: en keeps ≈25% (md5 < '40'), others ≈50%
    (< '80') — check both rates within generous binomial bounds."""
    from desdb_spark.session import load_table

    d = load_table(spark, SF_DIR, "documents")
    tot = {r["lang"]: r["count"] for r in d.groupBy("lang").count().collect()}
    samp = sample_stratified_docs(spark, SF_DIR)
    got = {r["lang"]: r["count"] for r in samp.groupBy("lang").count().collect()}
    en_rate = got.get("en", 0) / tot["en"]
    assert 0.10 <= en_rate <= 0.40
    rest_tot = sum(v for k, v in tot.items() if k != "en")
    rest_got = sum(v for k, v in got.items() if k != "en")
    assert 0.30 <= rest_got / rest_tot <= 0.70


def test_budget_select_overshoot_at_most_one_doc(spark, tmp_path):
    """Selection takes docs while the budget is not exhausted BEFORE
    them: sizes 900+900 pass (cum_before 0, 900), the third doc starts
    at 1800 < 2000 so it is taken too, the fourth (2700) is not."""
    rows = [_doc(i, 900) for i in range(1, 6)]
    _write_docs(spark, str(tmp_path), rows)
    out = docs_token_budget_select(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].n_selected == 3
    assert out[0].tokens_selected == 2700


def test_mix_weights_normalized_and_sqrt_scaled(spark, tmp_path):
    """Weights sum to 1 and follow sqrt(token) scaling: a source with 4×
    the tokens gets 2× the weight."""
    rows = [_doc(1, 400, source="big"), _doc(2, 100, source="small")]
    _write_docs(spark, str(tmp_path), rows)
    out = {r.source: r.mix_weight for r in corpus_mix_weights(spark, str(tmp_path)).collect()}
    assert out["big"] == pytest.approx(2 / 3, abs=1e-4)
    assert out["small"] == pytest.approx(1 / 3, abs=1e-4)
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-5)
