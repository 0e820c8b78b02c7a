"""Multimodal column handling (SURVEY.md §2B north-star multimodal).

Design for 100 TB media pipelines: media payloads are opaque ``binary``
columns with a typed ``struct`` metadata sidecar; heavy payloads stay in
object storage with a pointer column, and only the decode/feature stages
touch bytes — as Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the decode kernel is STUBBED
(deterministic fake, clearly marked); everything Spark-side — schema,
binary handling, batch iteration, UDF signature, partitioning — is real
and tested (tests/test_extensions.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Schema of a decoded media-feature batch (what a real decoder would emit).
DECODE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, feat array<float>"
)


def fake_decode_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decode kernel for ``mapInPandas``.

    A real implementation would do ``PIL.Image.open(io.BytesIO(payload))``
    / ``librosa.load`` / frame sampling here; those libraries are not in
    this container. The stub derives *deterministic* fake dimensions and a
    4-dim feature vector from the payload bytes so the full Spark plumbing
    (Arrow batch iteration, binary columns, array output) is exercised and
    assertable. Raises NotImplementedError only for unknown media types —
    the real/missing-codec boundary is explicit.
    """
    for pdf in batches:
        out = []
        for doc_id, mt, payload in zip(
            pdf["doc_id"], pdf["media_type"], pdf["payload"]
        ):
            if mt not in ("image", "audio"):
                raise NotImplementedError(f"no decoder for media_type={mt!r}")
            b = bytes(payload)
            n = len(b)
            csum = sum(b[:64]) if n else 0
            out.append(
                {
                    "doc_id": doc_id,
                    "media_type": mt,
                    "n_bytes": n,
                    "width": 16 + csum % 64,
                    "height": 16 + (csum // 64) % 64,
                    "feat": [float(n % 251), float(csum % 251), float(n % 17), float(csum % 17)],
                }
            )
        yield pd.DataFrame(out, columns=["doc_id", "media_type", "n_bytes", "width", "height", "feat"])


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stand-in media table: documents.text encoded as binary payloads with
    a typed metadata struct — the real multimodal column layout."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
        ).alias("meta"),
    )


@register(
    "multimodal_columns",
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
               md5(text) AS payload_md5,
               lang AS meta_lang,
               n_chars AS meta_n_chars
        FROM documents
    """,
    group="multimodal",
)
def multimodal_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary + struct column handling: payload length/digest + metadata
    projection, all JVM-side (hash-checked against the oracle)."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        F.length("payload").cast("bigint").alias("payload_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.n_chars").alias("meta_n_chars"),
    )
