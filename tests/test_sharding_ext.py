"""Round-8e: shard balance + cosine histogram — Python brute-force
parity at sf0.001 plus the reports' defining shapes: shards partition
the corpus exactly and the histogram shows the organic/twin separation
gap that justifies SEM_THRESHOLD."""

from __future__ import annotations

import hashlib
from collections import Counter

from desdb_spark.extensions.dedup_semantic import (
    SEM_THRESHOLD,
    twinned_scored_pairs,
)
from desdb_spark.extensions.sharding_ext import (
    COS_BUCKET_MICROS,
    SHARD_NIBBLES,
    docs_shard_assignment_balance,
    emb_cell_cosine_histogram,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_shard_balance_matches_brute_force(spark):
    docs = load_table(spark, SF_DIR, "documents").collect()
    n_docs, n_toks = Counter(), Counter()
    for r in docs:
        shard = hashlib.md5(str(r.doc_id).encode()).hexdigest()[
            :SHARD_NIBBLES
        ]
        n_docs[shard] += 1
        n_toks[shard] += len(r.text.split(" "))
    total = sum(n_toks.values())
    got = {r.shard: r for r in docs_shard_assignment_balance(spark, SF_DIR).collect()}
    assert set(got) == set(n_docs)
    for s in n_docs:
        r = got[s]
        assert (r.n_docs, r.n_tokens) == (n_docs[s], n_toks[s])
        assert r.token_share_micros == n_toks[s] * 1000000 // total
        assert (
            r.balance_micros
            == n_toks[s] * (16**SHARD_NIBBLES) * 1000000 // total
        )
    assert sum(r.n_docs for r in got.values()) == len(docs)


def test_cosine_histogram_shows_separation_gap(spark):
    rows = sorted(
        emb_cell_cosine_histogram(spark, SF_DIR).collect(),
        key=lambda r: r.bucket_lo_micros,
    )
    assert rows
    # total pairs equals the pair-grain count
    assert sum(r.n_pairs for r in rows) == twinned_scored_pairs(
        spark, SF_DIR
    ).count()
    thr = int(SEM_THRESHOLD * 1_000_000)
    top_bucket = rows[-1].bucket_lo_micros
    assert top_bucket >= thr - COS_BUCKET_MICROS  # twin spike exists
    # the gap: no mass in at least three buckets below the twin spike
    occupied = {r.bucket_lo_micros for r in rows}
    gap = [
        b
        for b in range(500_000, top_bucket, COS_BUCKET_MICROS)
        if b not in occupied
    ]
    assert len(gap) >= 3
