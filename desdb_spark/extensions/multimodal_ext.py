"""Multimodal plumbing ops, round 5 batch 3: frame sampling and batch
resize planning — the remaining stages of the §2B north-star multimodal
tier (decode/feature-extract live in extensions/multimodal.py, frozen at
their verified state).

Same honesty contract as the decode stub: the container has no video/image
codecs, so the *byte-level* kernel work is a clearly-marked deterministic
stand-in, while everything Spark owns at 100 TB — binary columns, Arrow
batch iteration, per-row fan-out schema, partition sizing, integer resize
arithmetic — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.extensions.multimodal import media_table

#: A fake "frame" is a fixed-size byte slice of the payload — the real
#: kernel would be an av/ffmpeg GOP-aligned decode; slice size stands in
#: for the decoded frame stride.
FRAME_BYTES = 256
FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_off bigint, "
    "frame_len int, frame_md5 string"
)

RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, out_w int, out_h int, "
    "scale_num int, scale_den int"
)

#: Resize target box (longest side), aspect preserved — integer math only.
TARGET_SIDE = 32


def fake_sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB frame-sampling kernel for ``mapInPandas``: every k-th
    FRAME_BYTES slice of the payload becomes one output row (k=2 → sample
    half the frames). Deterministic; a real decoder replaces only the
    slicing with codec frame extraction — the fan-out shape (one input
    row → many frame rows, md5 fingerprint per frame) is the production
    contract."""
    import hashlib

    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n_frames = max(1, len(b) // FRAME_BYTES)
            for idx in range(0, n_frames, 2):  # sample every 2nd frame
                off = idx * FRAME_BYTES
                chunk = b[off : off + FRAME_BYTES]
                out.append(
                    {
                        "doc_id": doc_id,
                        "frame_idx": idx,
                        "frame_off": off,
                        "frame_len": len(chunk),
                        "frame_md5": hashlib.md5(chunk).hexdigest(),
                    }
                )
        yield pd.DataFrame(
            out,
            columns=["doc_id", "frame_idx", "frame_off", "frame_len", "frame_md5"],
        )


@register("multimodal_frame_sample", group="multimodal_ext")  # rows-only: stub kernel
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage: video-like payloads fan out to every 2nd
    frame row with offset + fingerprint via an Arrow-batched mapInPandas
    kernel (slice identity asserted byte-for-byte in
    tests/test_multimodal_ext.py).

    Scale shape: the repartition before the kernel sizes decode tasks
    independently of upstream file layout; output rows carry fingerprints
    and offsets, NOT frame bytes — at 100 TB the sampled frames are
    written by the kernel to object storage and only pointers flow on,
    keeping the shuffle payload-free.
    """
    m = media_table(spark, sf_dir).where(F.col("media_type") == "image")
    frames = (
        m.select("doc_id", "payload")
        .repartition(8, "doc_id")
        .mapInPandas(fake_sample_frames, schema=FRAME_SCHEMA)
    )
    return frames.orderBy("doc_id", "frame_idx")


def plan_resize(width: F.Column, height: F.Column) -> list[F.Column]:
    """REAL resize arithmetic (JVM-side, exact integers): scale the longest
    side to TARGET_SIDE, preserve aspect, floor the short side, never
    upscale. Returns [out_w, out_h, scale_num, scale_den]."""
    longest = F.greatest(width, height)
    den = F.when(longest > TARGET_SIDE, longest).otherwise(F.lit(TARGET_SIDE))
    num = F.lit(TARGET_SIDE)
    out_w = F.floor(width * num / den).cast("int")
    out_h = F.floor(height * num / den).cast("int")
    return [
        out_w.alias("out_w"),
        out_h.alias("out_h"),
        num.cast("int").alias("scale_num"),
        den.cast("int").alias("scale_den"),
    ]


@register("multimodal_resize_batch", group="multimodal_ext")  # rows-only: stub dims
def multimodal_resize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch resize planning: decode dimensions (stub kernel, via the
    decode stage) → aspect-preserving integer resize plan per image. The
    resize math itself is REAL and runs JVM-side as column expressions —
    only the pixel resampling a real pipeline would hand to the decode
    kernel is absent, which is exactly the decode-stub boundary.

    Scale shape: dims come out of the decode stage's Arrow batches; the
    plan columns are whole-stage-codegen arithmetic with no extra
    shuffle or Python hop.
    """
    from desdb_spark.extensions.multimodal import DECODE_SCHEMA, fake_decode_media

    m = media_table(spark, sf_dir).where(F.col("media_type") == "image")
    decoded = (
        m.select("doc_id", "media_type", "payload")
        .repartition(8, "doc_id")
        .mapInPandas(fake_decode_media, schema=DECODE_SCHEMA)
    )
    return decoded.select(
        "doc_id", "width", "height", *plan_resize(F.col("width"), F.col("height"))
    ).orderBy("doc_id")
