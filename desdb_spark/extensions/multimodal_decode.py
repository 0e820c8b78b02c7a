"""Multimodal decode/feature-extract stage (registered op
`multimodal_decode_features`).

r9 module move (VERDICT r8 item 1, same mechanism as the r8 moves): the
registered op split out of extensions/multimodal.py so the r9 driver
window can hold exactly the driver-pending ops — its r8c rows→hash
oracle upgrade (byte-checksum stub features recomputed by DuckDB)
postdates its last (rows-only, r2) driver row. The Arrow kernel
(``fake_decode_media``), its output schema, and the binary media table
builder stay in extensions/multimodal.py unchanged and are imported
here; only the registration site moved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.extensions.multimodal import (
    DECODE_SCHEMA,
    fake_decode_media,
    media_table,
)
from desdb_spark.registry import register


@register(
    "multimodal_decode_features",
    # r8c rows→hash upgrade: the stub kernel's byte arithmetic (first-64
    # byte checksum over the ASCII payload) is SQL-expressible, so the
    # WHOLE Arrow path — binary encode, mapInPandas batch iteration,
    # pandas byte handling, array<float> output — is now value-checked
    # against DuckDB recomputing the same features from the source text.
    # A real codec stays rows-only by nature; the plumbing no longer is.
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END
                   AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(16 + csum % 64 AS INT) AS width,
               CAST(16 + (csum // 64) % 64 AS INT) AS height,
               round(CAST(octet_length(encode(text)) % 251 AS DOUBLE), 1)
                   AS f0
        FROM (
            SELECT doc_id, text,
                   COALESCE(list_sum(list_transform(
                       generate_series(1, least(length(text), 64)),
                       i -> ascii(substr(text, i, 1)))), 0) AS csum
            FROM documents)
    """,
    group="multimodal_decode",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract stage over binary payloads via mapInPandas.

    Repartitions by doc_id first — at 100 TB this is the knob that sizes
    decode tasks independently of the upstream file layout.
    """
    from desdb_spark.extensions.dedup import ensure_parallelism

    # r17: the literal repartition(8, doc_id) capped a 100 TB decode at 8
    # tasks AND unconditionally shuffled the payload at any scale; the
    # canonical conditional widener shuffles only a pathologically
    # under-split source. Per-row kernel, so content is width-independent.
    m = ensure_parallelism(media_table(spark, sf_dir))
    feats = m.select("doc_id", "media_type", "payload").mapInPandas(
        fake_decode_media, schema=DECODE_SCHEMA
    )
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "width",
        "height",
        F.round(F.element_at("feat", 1).cast("double"), 1).alias("f0"),
    ).orderBy("doc_id")
