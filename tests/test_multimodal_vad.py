"""Round-8e: VAD segment properties — numpy brute-force parity at
sf0.001 (independent reimplementation of gate + island merge over the
same gated waveform) plus the structural invariants: segments are
disjoint, ordered, within the frame range, and every voiced frame is
covered by exactly one segment."""

from __future__ import annotations

import numpy as np

from desdb_spark.extensions.multimodal_vad import (
    DOC_MOD,
    ENERGY_THRESHOLD,
    FRAME_LEN,
    N_SAMPLES,
    _gated_wave,
    multimodal_audio_vad_segments,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def _brute(doc_id: int):
    v = _gated_wave(doc_id).astype(np.int64)
    e = (v * v).reshape(-1, FRAME_LEN).sum(axis=1)
    segs = []
    run = None
    for f, en in enumerate(e):
        if en >= ENERGY_THRESHOLD:
            if run is None:
                run = [f, f, int(en)]
            else:
                run[1] = f
                run[2] += int(en)
        elif run is not None:
            segs.append(tuple(run))
            run = None
    if run is not None:
        segs.append(tuple(run))
    return segs


def test_vad_matches_numpy_brute_force(spark):
    doc_ids = [
        r.doc_id
        for r in load_table(spark, SF_DIR, "documents")
        .where(f"doc_id % {DOC_MOD} = 0")
        .select("doc_id")
        .collect()
    ]
    expect = {
        d: _brute(d) for d in doc_ids if _brute(d)
    }
    got = {}
    for r in multimodal_audio_vad_segments(spark, SF_DIR).collect():
        got.setdefault(r.doc_id, []).append(
            (r.seg_id, r.start_frame, r.end_frame, r.n_frames, r.energy_total)
        )
    assert set(got) == set(expect)
    for d, segs in expect.items():
        rows = sorted(got[d])
        assert [r[0] for r in rows] == list(range(1, len(segs) + 1))
        for (seg_id, s, e_, n, tot), (bs, be, ben) in zip(rows, segs):
            assert (s, e_, tot) == (bs, be, ben)
            assert n == be - bs + 1


def test_vad_segments_disjoint_and_in_range(spark):
    by_doc = {}
    for r in multimodal_audio_vad_segments(spark, SF_DIR).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    n_frames_total = N_SAMPLES // FRAME_LEN
    assert by_doc, "fixture must produce voiced segments"
    for segs in by_doc.values():
        segs.sort(key=lambda r: r.seg_id)
        prev_end = -2
        for r in segs:
            assert 0 <= r.start_frame <= r.end_frame < n_frames_total
            # separated by at least one silent frame, else merged
            assert r.start_frame > prev_end + 1
            prev_end = r.end_frame
