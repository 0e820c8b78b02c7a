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


@register(
    "multimodal_frame_sample",
    # r8c rows→hash upgrade (same move as multimodal_decode_features):
    # the stub kernel's byte arithmetic — every 2nd 256-byte slice, its
    # offset, length, and md5 — is SQL-expressible because the fixture
    # payloads are ASCII (byte slice ≡ char substr; asserted for the
    # whole family by the decode oracle's passing hash). So the entire
    # Arrow fan-out path — binary encode, mapInPandas batch iteration,
    # one-row→many-frames explosion, fingerprint output — is
    # value-checked. A real GOP-aligned decoder stays rows-only by
    # nature; the plumbing no longer is.
    oracle=f"""
        WITH base AS (
            SELECT doc_id, text, octet_length(encode(text)) AS nb
            FROM documents WHERE doc_id % 2 = 0
        ), frames AS (
            SELECT doc_id, text, nb,
                   unnest(generate_series(
                       0, CAST(greatest(nb // {FRAME_BYTES}, 1) AS INT) - 1,
                       2)) AS frame_idx
            FROM base
        )
        SELECT doc_id,
               CAST(frame_idx AS INT) AS frame_idx,
               CAST(frame_idx * {FRAME_BYTES} AS BIGINT) AS frame_off,
               CAST(least({FRAME_BYTES}, nb - frame_idx * {FRAME_BYTES})
                    AS INT) AS frame_len,
               md5(substr(text, frame_idx * {FRAME_BYTES} + 1,
                          {FRAME_BYTES})) AS frame_md5
        FROM frames
        ORDER BY doc_id, frame_idx
    """,
    group="multimodal_ext",
)
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
    from desdb_spark.extensions.dedup import ensure_parallelism

    m = media_table(spark, sf_dir).where(F.col("media_type") == "image")
    # r17: the literal repartition(8, doc_id) capped a 100 TB decode at 8
    # tasks AND unconditionally shuffled the payload bytes at any scale.
    # ensure_parallelism is the canonical conditional: a well-split
    # production table flows to the kernel with NO payload shuffle; only
    # a pathologically under-split source is widened (to the session's
    # parallelism). Row content is partitioning-independent; the trailing
    # orderBy fixes the declared order either way.
    frames = ensure_parallelism(m.select("doc_id", "payload")).mapInPandas(
        fake_sample_frames, schema=FRAME_SCHEMA
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


RESAMPLE_SCHEMA = (
    "doc_id bigint, width int, height int, out_w int, out_h int, "
    "out_md5 string, out_wsum bigint, px_sum bigint"
)


def make_rgb_buffer(doc_id: int, width: int, height: int) -> bytes:
    """Deterministic raw-RGB test pattern (no codec involved): pixel
    (y, x, c) = (3x + 7y + 11c + doc_id) mod 256. Used by both the
    registered op's synthesis stage and the pytest's NumPy reference —
    the planted byte pattern that makes resampling value-checkable."""
    import numpy as np

    y, x, c = np.ogrid[0:height, 0:width, 0:3]
    return ((3 * x + 7 * y + 11 * c + doc_id) % 256).astype("uint8").tobytes()


def resample_rgb_nearest(
    rgb: bytes, width: int, height: int, out_w: int, out_h: int
) -> bytes:
    """REAL pixel kernel (pure NumPy, codec-free): nearest-neighbor
    resample of a raw interleaved-RGB buffer. Source index mapping is
    exact integer floor arithmetic — (i·in_side) // out_side — so the
    output bytes are bit-deterministic across platforms."""
    import numpy as np

    img = np.frombuffer(rgb, dtype="uint8").reshape(height, width, 3)
    ys = (np.arange(out_h) * height) // out_h
    xs = (np.arange(out_w) * width) // out_w
    return img[ys][:, xs].tobytes()


def resample_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched resample stage: plan_resize's integer target dims +
    the nearest-neighbor byte kernel; emits fingerprint + exact pixel
    checksum, never the pixels (pointers-not-payloads, like frames)."""
    import hashlib

    import numpy as np

    for pdf in batches:
        out = []
        for doc_id, w, h, payload in zip(
            pdf["doc_id"], pdf["width"], pdf["height"], pdf["rgb"]
        ):
            w, h = int(w), int(h)
            longest = max(w, h)
            den = longest if longest > TARGET_SIDE else TARGET_SIDE
            out_w = max(1, (w * TARGET_SIDE) // den)
            out_h = max(1, (h * TARGET_SIDE) // den)
            resampled = resample_rgb_nearest(bytes(payload), w, h, out_w, out_h)
            arr = np.frombuffer(resampled, dtype="uint8").astype("int64")
            out.append(
                {
                    "doc_id": doc_id,
                    "width": w,
                    "height": h,
                    "out_w": out_w,
                    "out_h": out_h,
                    "out_md5": hashlib.md5(resampled).hexdigest(),
                    # Position-weighted checksum Σ (i+1)·byte_i: order-
                    # sensitive (unlike px_sum) yet SQL-recomputable
                    # (unlike md5 of raw bytes) — the differential pin.
                    "out_wsum": int(np.dot(np.arange(1, arr.size + 1), arr)),
                    "px_sum": int(arr.sum()),
                }
            )
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id", "width", "height", "out_w", "out_h",
                "out_md5", "out_wsum", "px_sum",
            ],
        )


def resample_pixels_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full resample pipeline including the md5 fingerprint column —
    the pytest's byte-exact surface. The registered op drops md5 (not
    SQL-recomputable over raw bytes) in favour of the position-weighted
    checksum, which is."""
    m = media_table(spark, sf_dir).where(F.col("media_type") == "image")
    dims = m.select(
        "doc_id",
        (F.col("doc_id") % 48 + 9).cast("int").alias("width"),
        (F.col("doc_id") % 29 + 5).cast("int").alias("height"),
    )

    def synth_and_resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.assign(
                rgb=[
                    make_rgb_buffer(int(d), int(w), int(h))
                    for d, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"])
                ]
            )
            yield from resample_kernel(iter([pdf]))

    from desdb_spark.extensions.dedup import ensure_parallelism

    return (
        # r17: conditional widening (see multimodal_frame_sample).
        ensure_parallelism(dims)
        .mapInPandas(synth_and_resample, schema=RESAMPLE_SCHEMA)
        .orderBy("doc_id")
    )


@register(
    "multimodal_resample_pixels",
    # r8c rows→hash upgrade: the planted-gradient source pixel (y, x, c)
    # = (3x + 7y + 11c + doc_id) mod 256 and the integer floor index
    # mapping make every RESAMPLED byte a closed-form expression, so the
    # oracle regenerates the full output image per doc and folds it into
    # the same px_sum and position-weighted checksum the NumPy kernel
    # emits. Byte ORDER is pinned by the weighted sum; byte-exact md5
    # remains asserted in tests/test_multimodal_ext.py via
    # resample_pixels_full (md5 over raw bytes isn't SQL-expressible).
    oracle=f"""
        WITH img AS (
            SELECT doc_id,
                   CAST(doc_id % 48 + 9 AS BIGINT) AS w,
                   CAST(doc_id % 29 + 5 AS BIGINT) AS h
            FROM documents WHERE doc_id % 2 = 0
        ), plan AS (
            SELECT doc_id, w, h,
                   CASE WHEN greatest(w, h) > {TARGET_SIDE}
                        THEN greatest(w, h) ELSE {TARGET_SIDE} END AS den
            FROM img
        ), dims AS (
            SELECT doc_id, w, h,
                   greatest(1, (w * {TARGET_SIDE}) // den) AS out_w,
                   greatest(1, (h * {TARGET_SIDE}) // den) AS out_h
            FROM plan
        ), yrows AS (
            SELECT doc_id, w, h, out_w, out_h,
                   unnest(generate_series(0, CAST(out_h AS INT) - 1)) AS y
            FROM dims
        ), xrows AS (
            SELECT *, unnest(generate_series(0, CAST(out_w AS INT) - 1)) AS x
            FROM yrows
        ), px AS (
            SELECT doc_id, w, h, out_w, out_h,
                   (3 * ((x * w) // out_w) + 7 * ((y * h) // out_h)
                    + 11 * cs.c + doc_id) % 256 AS byte,
                   (y * out_w + x) * 3 + cs.c + 1 AS pos
            FROM xrows, (SELECT unnest(generate_series(0, 2)) AS c) cs
        )
        SELECT doc_id,
               CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(out_w AS INT) AS out_w, CAST(out_h AS INT) AS out_h,
               CAST(sum(pos * byte) AS BIGINT) AS out_wsum,
               CAST(sum(byte) AS BIGINT) AS px_sum
        FROM px
        GROUP BY doc_id, w, h, out_w, out_h
        ORDER BY doc_id
    """,
    group="multimodal_ext",
)
def multimodal_resample_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level pixel path (VERDICT r7 item 8): synthesize a
    deterministic raw-RGB buffer per image doc (planted gradient — the
    stand-in for a decoder's output, which is exactly a raw buffer),
    then run the REAL nearest-neighbor resample kernel and report the
    resampled dims + exact order-sensitive pixel checksums. Unlike the
    decode stub, every byte here is real work a production pipeline
    runs after decode; tests/test_multimodal_ext.py asserts exact
    resampled pixel values (incl. md5) against an independent NumPy
    reference, including identity (no upscale) and extreme-aspect cases.

    Scale shape: synthesis and resampling are one fused Arrow-batched
    pass (mapInPandas); dims derive from doc_id so the stage is
    shuffle-free until the tiny result sort. Buffers never leave the
    task: fingerprints and checksums flow on.
    """
    return resample_pixels_full(spark, sf_dir).drop("out_md5")


@register(
    "multimodal_resize_batch",
    # r8c rows→hash upgrade: dims come from the decode stub's ASCII byte
    # checksum (already differentially proven by multimodal_decode_
    # features' oracle) and the resize plan is pure integer arithmetic,
    # so the whole op — Arrow decode hop included — is recomputable.
    oracle=f"""
        WITH c AS (
            SELECT doc_id,
                   COALESCE(list_sum(list_transform(
                       generate_series(1, least(length(text), 64)),
                       i -> ascii(substr(text, i, 1)))), 0) AS csum
            FROM documents WHERE doc_id % 2 = 0
        ), dims AS (
            SELECT doc_id,
                   CAST(16 + csum % 64 AS BIGINT) AS width,
                   CAST(16 + (csum // 64) % 64 AS BIGINT) AS height
            FROM c
        ), plan AS (
            SELECT doc_id, width, height,
                   CASE WHEN greatest(width, height) > {TARGET_SIDE}
                        THEN greatest(width, height)
                        ELSE {TARGET_SIDE} END AS den
            FROM dims
        )
        SELECT doc_id,
               CAST(width AS INT) AS width,
               CAST(height AS INT) AS height,
               CAST((width * {TARGET_SIDE}) // den AS INT) AS out_w,
               CAST((height * {TARGET_SIDE}) // den AS INT) AS out_h,
               CAST({TARGET_SIDE} AS INT) AS scale_num,
               CAST(den AS INT) AS scale_den
        FROM plan ORDER BY doc_id
    """,
    group="multimodal_ext",
)
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
    from desdb_spark.extensions.dedup import ensure_parallelism

    decoded = (
        # r17: conditional widening (see multimodal_frame_sample).
        ensure_parallelism(m.select("doc_id", "media_type", "payload"))
        .mapInPandas(fake_decode_media, schema=DECODE_SCHEMA)
    )
    return decoded.select(
        "doc_id", "width", "height", *plan_resize(F.col("width"), F.col("height"))
    ).orderBy("doc_id")
