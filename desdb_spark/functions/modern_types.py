"""Round-6 batch-2 type-system breadth: the Spark 4 VARIANT type and the
MAP column family — the two column kinds the engine's scalar groups had
not yet exercised (struct/array/json-string are covered by scalars.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "scalar_variant_json",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_nested,
               round(value, 6) AS val_nested,
               event_type AS type_nested
        FROM events
    """,
    group="modern_types",
)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT navigation (Spark 4): build a nested semi-structured
    document per event — ``{"type": ..., "payload": {"k": ..., "value":
    ...}}`` — parse it to a VARIANT, and extract typed values back out
    with ``variant_get`` path expressions. The oracle reads the same
    leaves from the flat columns, so the hash check certifies the whole
    encode → VARIANT → typed-path-extract loop is lossless.

    VARIANT vs get_json_object (scalar_json_events): variant parses once
    into a binary tree and every later path walk is structural, not a
    string re-parse — the right storage for ragged telemetry at scale.

    Scale shape: pure scan-side expressions, whole-stage codegen, no
    shuffle at all.
    """
    ev = load_table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_type").alias("type"),
            F.struct(
                F.get_json_object("props", "$.k").cast("bigint").alias("k"),
                F.col("value"),
            ).alias("payload"),
        )
    )
    with_variant = ev.select("event_id", F.parse_json(doc).alias("v"))
    return with_variant.select(
        "event_id",
        F.expr("variant_get(v, '$.payload.k', 'bigint')").alias("k_nested"),
        F.round(
            F.expr("variant_get(v, '$.payload.value', 'double')"), 6
        ).alias("val_nested"),
        F.expr("variant_get(v, '$.type', 'string')").alias("type_nested"),
    )


@register(
    "scalar_map_funcs",
    oracle="""
        WITH kv AS (
            SELECT event_type, 'k' AS key,
                   2 * CAST(json_extract_string(props, '$.k') AS BIGINT) AS v
            FROM events
            UNION ALL
            SELECT event_type, 'vfloor' AS key,
                   2 * CAST(floor(value * 10) AS BIGINT) AS v
            FROM events)
        SELECT event_type, key, CAST(sum(v) AS BIGINT) AS total,
               count(*) AS n
        FROM kv
        GROUP BY event_type, key
    """,
    group="modern_types",
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP column pipeline: build a map<string,bigint> per event
    (map_from_arrays), double every value with a transform_values
    lambda, explode to (key, value) rows, aggregate. The oracle states
    the same arithmetic relationally (each map entry = one UNION ALL
    arm), so the hash check certifies map construction, the lambda, and
    the explode — the full life cycle of a map column.

    floor(), not round(): Spark rounds HALF_UP and DuckDB half-away —
    identical for positive values but a parity trap worth never setting.

    Scale shape: explode doubles the row count before the aggregate, but
    partial aggregation collapses map-side to |types|×|keys| rows per
    task; the generator itself is codegen'd, no Python.
    """
    ev = load_table(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("k"), F.lit("vfloor")),
        F.array(
            F.get_json_object("props", "$.k").cast("bigint"),
            F.floor(F.col("value") * 10).cast("bigint"),
        ),
    )
    doubled = F.transform_values(m, lambda _k, v: v * 2)
    return (
        ev.select("event_type", F.explode(doubled).alias("key", "v"))
        .groupBy("event_type", "key")
        .agg(F.sum("v").alias("total"), F.count("*").alias("n"))
    )
