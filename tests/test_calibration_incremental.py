"""Semantics pins for the r7 calibration + incremental-dedup ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_incremental_dedup_planted_classes(spark, tables):
    from desdb_spark.extensions.dedup_incremental import (
        CORPUS_FRACTION,
        dedup_incremental_new_batch,
    )

    rows = {r.status: r for r in dedup_incremental_new_batch(spark, SF_DIR).collect()}
    assert set(rows) == {"novel", "dup_of_corpus", "dup_in_batch"}
    d = tables["documents"].select("doc_id").orderBy("doc_id").collect()
    ids = [r.doc_id for r in d]
    n_corpus = int(len(ids) * CORPUS_FRACTION)
    corpus_ids, batch_ids = ids[:n_corpus], ids[n_corpus:]
    # every planted corpus-copy is found via the canonical digest index
    assert rows["dup_of_corpus"].n_docs == sum(1 for i in corpus_ids if i % 100 == 0)
    assert rows["dup_in_batch"].n_docs == sum(1 for i in batch_ids if i % 100 == 0)
    assert rows["novel"].n_docs == len(batch_ids)
    assert rows["dup_of_corpus"].first_doc >= 1_000_000
    assert rows["dup_in_batch"].first_doc >= 2_000_000


def test_length_calibration_consistency(spark, tables):
    from desdb_spark.extensions.calibration_ext import (
        TARGET_DEN,
        TARGET_NUM,
        corpus_length_cutoff_calibrate,
        corpus_length_retention_curve,
    )

    curve = {r.cutoff: r for r in corpus_length_retention_curve(spark, SF_DIR).collect()}
    # retention is monotone non-increasing in the cutoff
    cuts = sorted(curve)
    for a, b in zip(cuts, cuts[1:]):
        assert curve[a].tokens_kept >= curve[b].tokens_kept
        assert curve[a].docs_kept >= curve[b].docs_kept

    (cal,) = corpus_length_cutoff_calibrate(spark, SF_DIR).collect()
    docs = tables["documents"].select(
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n")
    ).collect()
    lens = [r.n for r in docs]
    total = sum(lens)
    kept = sum(x for x in lens if x >= cal.cutoff)
    assert kept == cal.tokens_kept
    assert kept * TARGET_DEN >= total * TARGET_NUM
    # maximality: one step higher cutoff would drop below the target
    kept_next = sum(x for x in lens if x >= cal.cutoff + 1)
    assert kept_next * TARGET_DEN < total * TARGET_NUM or kept_next == kept
