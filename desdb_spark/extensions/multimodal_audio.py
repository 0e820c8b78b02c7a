"""Round-8: audio-shaped multimodal pipeline with HASH-grade evidence —
the binary-column plumbing (opaque bytes → Arrow batch → numpy frame →
features) exercised end to end on a waveform every engine can agree on.

The multimodal tier's decode boundary is stubbed for real codecs (no
libs in the container — multimodal.py documents that honestly), which
left the tier rows-only. This op closes the evidence gap WITHOUT
codecs: the "recording" is a deterministic integer waveform
(sample_i = ((doc_id·7919 + i·104729) mod 65536) − 32768, pure modular
arithmetic — no sin/exp, per [[cross-engine-float-traps]]), PCM-encoded
to an int16 BINARY column by one Arrow kernel, then decoded by a
SECOND kernel that must recover the samples from raw bytes to compute
energy (Σv², exact in int64) and zero-crossing counts. DuckDB
regenerates the same waveform relationally (generate_series + lag) —
any byte-order, truncation, or off-by-one in the binary round-trip
flips the per-document hash.

Scale shape: both kernels are mapInPandas over the documents subset —
embarrassingly parallel, Arrow-batched, no shuffle until the final
per-doc result (which IS the output). Real audio swaps the waveform
formula for a codec call; every other line survives.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Every 50th document carries a synthetic recording.
DOC_MOD = 50
#: Samples per recording (int16 → 800 bytes).
N_SAMPLES = 400


def _wave(doc_id: int) -> np.ndarray:
    i = np.arange(N_SAMPLES, dtype=np.int64)
    return ((doc_id * 7919 + i * 104729) % 65536 - 32768).astype(np.int16)


def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "audio": [
                    _wave(int(d)).astype("<i2").tobytes() for d in pdf["doc_id"]
                ],
            }
        )


def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for doc_id, buf in zip(pdf["doc_id"], pdf["audio"]):
            v = np.frombuffer(buf, dtype="<i2").astype(np.int64)
            sum_sq = int((v * v).sum())
            zcr = int(np.count_nonzero((v[1:] < 0) != (v[:-1] < 0)))
            out.append((int(doc_id), sum_sq, zcr))
        yield pd.DataFrame(out, columns=["doc_id", "sum_sq", "zcr"])


@register(
    "multimodal_audio_pcm_features",
    oracle=f"""
        WITH d AS (
            SELECT doc_id FROM documents WHERE doc_id % {DOC_MOD} = 0
        ), s AS (
            SELECT doc_id, i,
                   (doc_id * 7919 + i * 104729) % 65536 - 32768 AS v
            FROM d, generate_series(0, {N_SAMPLES - 1}) AS t(i)
        ), lagged AS (
            SELECT doc_id, v,
                   lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
            FROM s
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(sum(v * v) AS BIGINT) AS sum_sq,
               CAST(sum(CASE WHEN prev IS NOT NULL
                                  AND ((v < 0) <> (prev < 0))
                             THEN 1 ELSE 0 END) AS BIGINT) AS zcr
        FROM lagged GROUP BY doc_id ORDER BY doc_id
    """,
    group="multimodal_audio",
)
def multimodal_audio_pcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM encode → opaque binary column → decode → integer features,
    per document — hashed against DuckDB regenerating the waveform
    relationally, so the Arrow binary round-trip (byte order, length,
    alignment) and the feature arithmetic are both inside the gate.
    """
    d = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("bigint"))
        .where(F.col("doc_id") % DOC_MOD == 0)
    )
    encoded = d.mapInPandas(_encode, schema="doc_id bigint, audio binary")
    feats = encoded.mapInPandas(
        _features, schema="doc_id bigint, sum_sq bigint, zcr bigint"
    )
    return feats.orderBy("doc_id")
