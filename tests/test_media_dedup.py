"""Round-8d: streaming aHash dedup — the streaming final state must be
bit-identical to the batch operator (same oracle, same schema), which
is the exactly-once/replayability contract a streaming dedup owes."""

from __future__ import annotations

from desdb_spark.extensions.multimodal_phash import (
    multimodal_image_ahash_dedup,
)
from desdb_spark.streaming.media_dedup import stream_image_ahash_dedup
from tests.conftest import SF_DIR


def test_streaming_state_equals_batch(spark):
    batch = {
        (r.hash_lo, r.hash_hi): (r.n_members, r.keep_doc, r.member_ids)
        for r in multimodal_image_ahash_dedup(spark, SF_DIR).collect()
    }
    stream = {
        (r.hash_lo, r.hash_hi): (r.n_members, r.keep_doc, r.member_ids)
        for r in stream_image_ahash_dedup(spark, SF_DIR).collect()
    }
    assert stream == batch
    assert batch, "fixture should contain duplicate-image groups"
