"""Scalar function families (SURVEY.md §2B scalar functions).

Reference parity: string manipulation mirrors desdb's path/name handling
[desdb:files.py — SURVEY.md §2A A8]; date/math/json families are the
arbitrary-SQL surface (A1). Each operator exercises a whole family so one
hash covers every function.

Scale notes: all built-in ``pyspark.sql.functions`` — JVM expressions
inside whole-stage codegen, zero Python in the row path.

Cross-engine type discipline (learned via selfcheck): Spark ``ceil``/
``floor`` return LONG while DuckDB returns DOUBLE/DECIMAL, and Spark
``year`` returns INT while DuckDB returns BIGINT — every such column is
explicitly cast identically on both sides so the driver's schema compare
can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "scalar_string_funcs",
    oracle="""
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               lower(p_brand) AS brand_lower,
               substr(p_name, 1, 5) AS name_pre,
               CAST(length(p_name) AS INT) AS name_len,
               trim(concat('  ', p_name, '  ')) AS name_trim,
               replace(p_name, ' ', '_') AS name_us,
               split_part(p_name, ' ', 1) AS first_word,
               regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
        FROM part
    """,
    group="scalars",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substr/length/trim/replace/split_part/regexp_extract."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(month(o_orderdate) AS INT) AS o_month,
               CAST(day(o_orderdate) AS INT) AS o_day,
               date_trunc('month', o_orderdate) AS month_start,
               CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
               CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_ts
        FROM orders
    """,
    group="scalars",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day, date_trunc, day difference, interval arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("o_year"),
        F.month(d).alias("o_month"),
        F.dayofmonth(d).alias("o_day"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since"),
        (d.cast("date") + F.expr("INTERVAL 30 DAYS")).cast("timestamp").alias("due_ts"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice, 1) AS price_r1,
               abs(l_discount - 0.05) AS disc_dev,
               CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
               CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
               round(ln(l_extendedprice), 6) AS price_ln,
               round(sqrt(l_quantity), 6) AS qty_sqrt,
               round(power(l_quantity, 2), 4) AS qty_sq,
               l_orderkey % 7 AS key_mod7
        FROM lineitem
    """,
    group="scalars",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/ln/sqrt/power/mod.

    Transcendentals (ln/sqrt/pow) are rounded to 6 dp: unlike +-*/ they
    are not bitwise-identical across math libraries.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice"), 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(q).alias("qty_ceil"),
        F.floor(q).alias("qty_floor"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.sqrt(q), 6).alias("qty_sqrt"),
        F.round(F.pow(q, 2), 4).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


@register(
    "scalar_json_events",
    oracle="""
        SELECT event_type, count(*) AS cnt,
               round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k,
               CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        FROM events
        GROUP BY event_type
    """,
    group="scalars",
)
def scalar_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events props column, aggregated per type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.round(F.avg(k.cast("double")), 4).alias("avg_k"),
        F.max(k.cast("bigint")).alias("max_k"),
    )


@register(
    "scalar_array_funcs",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS emb_len,
               round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
               round(CAST(embedding[64] AS DOUBLE), 6) AS last_val,
               round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 4) AS emb_sum,
               round(list_aggregate(CAST(list_slice(embedding, 1, 8) AS DOUBLE[]), 'sum'), 4) AS head_sum
        FROM embeddings
    """,
    group="scalars",
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/slice/aggregate over the embedding array column.

    float32 elements are cast to double *before* summing on both sides so
    accumulation happens in the same precision.
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").alias("emb_len"),
        F.round(F.element_at(emb_d, 1), 6).alias("first_val"),
        F.round(F.element_at(emb_d, 64), 6).alias("last_val"),
        F.round(
            F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("emb_sum"),
        F.round(
            F.aggregate(F.slice(emb_d, 1, 8), F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("head_sum"),
    )
