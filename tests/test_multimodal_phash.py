"""Round-8d: aHash dedup properties — the kernel's byte path pinned
against an independent NumPy reference, plus the two planted perceptual
invariances: brightness-shifted variants collapse into one hash,
inverted corruptions split into their own clusters."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from desdb_spark.extensions.multimodal_phash import (
    CORRUPT_STRIDE,
    N_GROUPS,
    SIDE,
    image_hashes,
    make_gray_buffer,
    multimodal_image_ahash_dedup,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def _ref_hash(doc_id: int) -> tuple[int, int]:
    arr = (
        np.frombuffer(make_gray_buffer(doc_id), dtype=np.uint8)
        .reshape(SIDE, SIDE)
        .astype(np.int64)
    )
    c = SIDE // 8
    cells = (
        arr.reshape(8, c, 8, c).swapaxes(1, 2).reshape(8, 8, c * c).sum(2)
        // (c * c)
    )
    bits = (cells > cells.sum() // 64).ravel()
    lo, hi = 0, 0
    for i in range(64):
        if bits[i]:
            if i < 32:
                lo |= 1 << i
            else:
                hi |= 1 << (i - 32)
    return lo, hi


def test_kernel_matches_numpy_reference(spark):
    got = {
        r.doc_id: (r.hash_lo, r.hash_hi)
        for r in image_hashes(spark, SF_DIR).collect()
    }
    doc_ids = [
        r.doc_id
        for r in load_table(spark, SF_DIR, "documents").collect()
        if r.doc_id % 2 == 0
    ]
    assert set(got) == set(doc_ids)
    for d in doc_ids:
        assert got[d] == _ref_hash(d)


def test_planted_invariances(spark):
    rows = image_hashes(spark, SF_DIR).collect()
    by_class = defaultdict(set)
    for r in rows:
        by_class[(r.doc_id % N_GROUPS, r.doc_id % CORRUPT_STRIDE == 0)].add(
            (r.hash_lo, r.hash_hi)
        )
    # brightness shifts (doc_id % 4) never split a (group, corrupt) class
    assert all(len(hs) == 1 for hs in by_class.values())
    # inversion splits: wherever a group has both classes, hashes differ
    both = [
        g
        for g in range(N_GROUPS)
        if (g, False) in by_class and (g, True) in by_class
    ]
    assert both, "fixture should contain corrupted and clean docs in one group"
    for g in both:
        assert by_class[(g, False)] != by_class[(g, True)]


def test_dedup_groups_cover_all_multi_member_hashes(spark):
    hashes = image_hashes(spark, SF_DIR).collect()
    count = defaultdict(list)
    for r in hashes:
        count[(r.hash_lo, r.hash_hi)].append(r.doc_id)
    expect = {
        k: sorted(v) for k, v in count.items() if len(v) >= 2
    }
    got = {
        (r.hash_lo, r.hash_hi): [int(x) for x in r.member_ids.split(",")]
        for r in multimodal_image_ahash_dedup(spark, SF_DIR).collect()
    }
    assert got == expect
