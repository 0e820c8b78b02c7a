"""Round-8e: energy-threshold voice-activity detection (VAD) over the
PCM binary tier — the segmentation step an audio training pipeline runs
between decode and transcription (classic energy-gate VAD, public
literature, e.g. Rabiner & Sambur 1975; modern pipelines gate with a
model but keep exactly this frame→threshold→merge shape).

Follows multimodal_audio_pcm_features' evidence pattern: the
"recording" is a deterministic integer waveform both engines can
regenerate exactly — here amplitude-GATED so it actually alternates
voice/silence: frame r of doc d is voiced iff (d·31 + r·17) mod 7 < 3;
voiced samples span the full int16 range, silence samples are confined
to [-128, 127] (pure modular arithmetic, no floats). The Spark side
PCM-encodes to an opaque BINARY column and must recover per-frame
energies from raw bytes (any byte-order / framing error flips the
hash); segment assembly is gaps-and-islands over the frame table.

Scale shape: the two Arrow kernels are embarrassingly parallel
mapInPandas; the frame table shuffles ONCE on doc_id for the island
windows (frames-per-doc is a codec constant, so per-key width is
bounded) and the segment groupBy reuses that partitioning. Real audio
swaps the waveform formula for a codec call and the threshold for a
model score; the plan is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Every DOC_MOD-th document carries a synthetic recording.
DOC_MOD = 50
#: Samples per recording / per frame (int16; 20 frames per doc).
N_SAMPLES = 400
FRAME_LEN = 20
#: Frame-energy gate: silence frames max out at FRAME_LEN·128² ≈ 3.3e5;
#: voiced frames sit around FRAME_LEN·32768²/3 ≈ 7e9 — three decades of
#: separation, so the exact gate value is uncritical (as in practice).
ENERGY_THRESHOLD = 1_000_000


def _gated_wave(doc_id: int) -> np.ndarray:
    i = np.arange(N_SAMPLES, dtype=np.int64)
    loud = (doc_id * 7919 + i * 104729) % 65536 - 32768
    quiet = (doc_id * 7919 + i * 104729) % 256 - 128
    voiced = (doc_id * 31 + (i // FRAME_LEN) * 17) % 7 < 3
    return np.where(voiced, loud, quiet).astype(np.int16)


def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "audio": [
                    _gated_wave(int(d)).astype("<i2").tobytes()
                    for d in pdf["doc_id"]
                ],
            }
        )


def _frame_energies(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for doc_id, buf in zip(pdf["doc_id"], pdf["audio"]):
            v = np.frombuffer(buf, dtype="<i2").astype(np.int64)
            e = (v * v).reshape(-1, FRAME_LEN).sum(axis=1)
            out.extend(
                (int(doc_id), f, int(en)) for f, en in enumerate(e)
            )
        yield pd.DataFrame(out, columns=["doc_id", "frame", "energy"])


@register(
    "multimodal_audio_vad_segments",
    oracle=f"""
        WITH d AS (
            SELECT doc_id FROM documents WHERE doc_id % {DOC_MOD} = 0
        ), s AS (
            SELECT doc_id, i, i // {FRAME_LEN} AS frame,
                   CASE WHEN (doc_id * 31 + (i // {FRAME_LEN}) * 17) % 7 < 3
                        THEN (doc_id * 7919 + i * 104729) % 65536 - 32768
                        ELSE (doc_id * 7919 + i * 104729) % 256 - 128
                   END AS v
            FROM d, generate_series(0, {N_SAMPLES - 1}) AS t(i)
        ), frames AS (
            SELECT doc_id, frame, sum(v * v) AS energy
            FROM s GROUP BY doc_id, frame
        ), voiced AS (
            SELECT doc_id, frame, energy,
                   frame - row_number() OVER (
                       PARTITION BY doc_id ORDER BY frame) AS grp
            FROM frames WHERE energy >= {ENERGY_THRESHOLD}
        ), segs AS (
            SELECT doc_id, min(frame) AS start_frame,
                   max(frame) AS end_frame,
                   CAST(count(*) AS BIGINT) AS n_frames,
                   CAST(sum(energy) AS BIGINT) AS energy_total
            FROM voiced GROUP BY doc_id, grp
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY start_frame) AS BIGINT)
                   AS seg_id,
               CAST(start_frame AS BIGINT) AS start_frame,
               CAST(end_frame AS BIGINT) AS end_frame,
               n_frames, energy_total
        FROM segs ORDER BY doc_id, seg_id
    """,
    group="multimodal_vad",
)
def multimodal_audio_vad_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Voice-activity segments per recording: decode the PCM binary
    column, gate {FRAME_LEN}-sample frame energies at ENERGY_THRESHOLD,
    and merge consecutive voiced frames into numbered segments with
    their extent and total energy — the cut list a transcription stage
    consumes."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("bigint"))
        .where(F.col("doc_id") % DOC_MOD == 0)
    )
    encoded = d.mapInPandas(_encode, schema="doc_id bigint, audio binary")
    frames = encoded.mapInPandas(
        _frame_energies, schema="doc_id bigint, frame bigint, energy bigint"
    )
    w = Window.partitionBy("doc_id").orderBy("frame")
    voiced = frames.where(F.col("energy") >= ENERGY_THRESHOLD).withColumn(
        "grp", F.col("frame") - F.row_number().over(w)
    )
    segs = voiced.groupBy("doc_id", "grp").agg(
        F.min("frame").alias("start_frame"),
        F.max("frame").alias("end_frame"),
        F.count("*").cast("bigint").alias("n_frames"),
        F.sum("energy").cast("bigint").alias("energy_total"),
    )
    ws = Window.partitionBy("doc_id").orderBy("start_frame")
    return segs.select(
        "doc_id",
        F.row_number().over(ws).cast("bigint").alias("seg_id"),
        F.col("start_frame").cast("bigint").alias("start_frame"),
        F.col("end_frame").cast("bigint").alias("end_frame"),
        "n_frames",
        "energy_total",
    ).orderBy("doc_id", "seg_id")
