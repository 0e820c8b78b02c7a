"""Property pins for the four r9 ops (beyond their differential hash):
shard-manifest packing invariants, a planted degenerate loop, DoReMi
weight monotonicity/normalization, and bitext-margin consistency
against an independent NumPy recomputation."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from desdb_spark.extensions.bitext_mine import (
    ANCHOR_LABEL,
    CAND_LABEL,
    MARGIN_K,
    emb_bitext_mine_margin,
)
from desdb_spark.extensions.doremi_ext import corpus_doremi_weight_update
from desdb_spark.extensions.loop_detect import MAX_LAG, text_loop_periodicity
from desdb_spark.extensions.shard_budget import (
    SHARD_CAP,
    docs_shard_by_token_budget,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_shard_budget_packing_invariants(spark):
    rows = docs_shard_by_token_budget(spark, SF_DIR).collect()
    per_source: dict = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r)
    d = load_table(spark, SF_DIR, "documents")
    truth_tokens = {
        r.source: r.tot
        for r in d.select(
            "source",
            F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias(
                "nt"
            ),
        )
        .groupBy("source")
        .agg(F.sum("nt").alias("tot"))
        .collect()
    }
    for source, shards in per_source.items():
        shards.sort(key=lambda r: r.shard_ix)
        # shard indexes are dense from 0 and doc ranges are contiguous
        assert [s.shard_ix for s in shards] == list(range(len(shards)))
        for prev, cur in zip(shards, shards[1:]):
            assert prev.last_doc < cur.first_doc
        # token totals conserve the source exactly
        assert sum(s.shard_tokens for s in shards) == truth_tokens[source]
        # greedy boundary law: after every non-final shard the cumulative
        # token count has crossed that shard's cap multiple
        cum = 0
        for s in shards[:-1]:
            cum += s.shard_tokens
            assert cum >= (s.shard_ix + 1) * SHARD_CAP


def test_loop_detect_planted_period(spark, tmp_path):
    loop2 = " ".join(["ping", "pong"] * 20)  # perfect period 2
    loop3 = " ".join(["a", "b", "c"] * 12) + " tail"  # near-perfect 3
    clean = "the quick brown fox jumps over the lazy dog again and again"
    spark.createDataFrame(
        [(1, loop2, "en", "s", len(loop2)),
         (2, loop3, "en", "s", len(loop3)),
         (3, clean, "en", "s", len(clean))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in text_loop_periodicity(spark, str(tmp_path)).collect()}
    assert got[1].best_lag == 2 and got[1].looping == 1
    assert got[1].loop_rate_micros == 1_000_000  # every position repeats
    assert got[2].best_lag == 3 and got[2].looping == 1
    assert got[3].looping == 0


def test_doremi_weights_normalized_and_monotone(spark):
    rows = corpus_doremi_weight_update(spark, SF_DIR).collect()
    assert abs(sum(r.weight_after for r in rows) - 1.0) < 1e-2  # 4dp each
    by_excess = sorted(rows, key=lambda r: r.excess_nll)
    weights = [r.weight_after for r in by_excess]
    assert weights == sorted(weights)  # exp is monotone
    # excess is centered: the token-weighted mean excess is ~0
    tot = sum(r.n_tokens for r in rows)
    centered = sum(r.excess_nll * r.n_tokens for r in rows) / tot
    assert abs(centered) < 1e-3


def test_bitext_margin_matches_numpy(spark):
    e = load_table(spark, SF_DIR, "embeddings").collect()
    A = [(r.vec_id, np.array(r.embedding, dtype="float64"))
         for r in e if r.label == ANCHOR_LABEL]
    B = [(r.vec_id, np.array(r.embedding, dtype="float64"))
         for r in e if r.label == CAND_LABEL]
    a_ids = np.array([i for i, _ in A])
    b_ids = np.array([i for i, _ in B])
    MA = np.stack([v for _, v in A])
    MB = np.stack([v for _, v in B])
    S = (MA @ MB.T) / np.outer(
        np.linalg.norm(MA, axis=1), np.linalg.norm(MB, axis=1)
    )
    S = np.sign(S) * np.floor(np.abs(S) * 1e6 + 0.5) / 1e6

    got = {r.anchor_id: r for r in emb_bitext_mine_margin(spark, SF_DIR).collect()}
    assert set(got) == set(a_ids.tolist())
    for ai, row in enumerate(a_ids):
        s_row = S[ai]
        top = np.lexsort((b_ids, -s_row))[0]
        r = got[row]
        assert r.match_id == b_ids[top]
        assert abs(r.cos_sim - s_row[top]) < 1e-9
        avg_a = float(np.sum(s_row[np.lexsort((b_ids, -s_row))[:MARGIN_K]]) / MARGIN_K)
        bj = np.where(b_ids == r.match_id)[0][0]
        s_col = S[:, bj]
        avg_b = float(np.sum(s_col[np.lexsort((a_ids, -s_col))[:MARGIN_K]]) / MARGIN_K)
        margin = round(2 * s_row[top] / (avg_a + avg_b), 4)
        assert abs(r.margin - margin) < 2e-4  # one 4dp ulp of summation slack
        assert r.accepted == (1 if r.margin >= 1.05 else 0)


def test_bloom_dedup_no_false_negatives_and_fp_accounting(spark):
    from desdb_spark.extensions.bloom_dedup import (
        K_HASHES,
        M_BITS,
        dedup_bloom_lines_incremental,
    )

    rows = dedup_bloom_lines_incremental(spark, SF_DIR).collect()
    assert rows, "new batch must produce per-doc rows"
    total_lines = sum(r.n_lines for r in rows)
    total_hits = sum(r.n_bloom_hits for r in rows)
    total_true = sum(r.n_true_dups for r in rows)
    for r in rows:
        # Bloom filters never miss a true member.
        assert r.n_bloom_hits >= r.n_true_dups, r
        assert r.n_lines >= r.n_bloom_hits, r
    # False-positive mass stays within ~4x the theoretical rate at this
    # load (generous slack; the differential hash pins the exact counts,
    # this pins the STATISTICAL claim the op's docstring makes).
    import math

    d = load_table(spark, SF_DIR, "documents")
    n_inserted = (
        d.where(F.col("doc_id") % 2 == 0)
        .select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(
                            F.size(F.filter(F.split("text", " "), lambda x: x != ""))
                            / F.lit(8)
                        ).cast("int")
                        - 1,
                    ),
                    lambda i: i,
                )
            )
        )
        .count()
    )
    p_fp = (1 - math.exp(-K_HASHES * n_inserted / M_BITS)) ** K_HASHES
    fp = total_hits - total_true
    assert fp <= max(5, 4 * p_fp * total_lines), (
        fp,
        p_fp,
        total_lines,
        n_inserted,
    )
