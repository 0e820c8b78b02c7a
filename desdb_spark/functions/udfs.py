"""UDF / UDAF / UDTF surface (SURVEY.md §2B UDF rows).

Reference parity: desdb's NumPy bridge converted Oracle cursor batches to
recarrays client-side [desdb:desdb.py — SURVEY.md §2A A3]; the engine's
analogue is Arrow-vectorized Python: ``pandas_udf`` for scalars,
``applyInPandas`` for grouped transforms, ``posexplode`` for the
table-generating case (built-in — no Python needed at all).

Scale notes (100 TB): Python touches data *only* through Arrow batches
(~10-100× faster than row-at-a-time UDFs); the grouped z-score shuffles
once on the group key and each group is processed as a single pandas frame
— groups must fit in executor memory, which is the documented contract
(salt or pre-aggregate if a group can exceed it).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "udf_scalar_pandas",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(ln(1 + l_extendedprice * 0.1), 6) AS price_lognorm
        FROM lineitem
    """,
    group="udfs",
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF: log-normalized price.

    The same formula is expressible in SQL (that's the oracle); the point
    of this operator is the Arrow round-trip, verified hash-identical.
    """

    @pandas_udf("double")
    def lognorm(price: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.log1p(price.to_numpy() * 0.1)).round(6)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        lognorm(F.col("l_extendedprice")).alias("price_lognorm"),
    )


@register(
    "udaf_grouped_zscore",
    oracle="""
        SELECT o_orderkey,
               round((o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_orderstatus))
                     / stddev_samp(o_totalprice) OVER (PARTITION BY o_orderstatus), 4) AS zscore
        FROM orders
    """,
    group="udfs",
)
def udaf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score of order totals via ``applyInPandas``.

    Each o_orderstatus group arrives as one pandas DataFrame; ddof=1
    matches stddev_samp. Output rounded (order-dependent mean/std).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf["o_totalprice"]
        z = (p - p.mean()) / p.std(ddof=1)
        return pd.DataFrame({"o_orderkey": pdf["o_orderkey"], "zscore": z.round(4)})

    return o.groupBy("o_orderstatus").applyInPandas(
        zscore, schema="o_orderkey bigint, zscore double"
    )


@register(
    "udtf_explode_unnest",
    oracle="""
        SELECT vec_id,
               CAST(i - 1 AS INT) AS pos,
               round(CAST(embedding[i] AS DOUBLE), 6) AS val
        FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i)
    """,
    group="udfs",
)
def udtf_explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode embedding arrays to (vec_id, pos, val) — built-in posexplode.

    The oracle exploits the fixed length-64 arrays (FIXTURES.md) with a
    generate_series cross join; Spark's posexplode is length-agnostic.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.round(F.col("col"), 6).alias("val"),
    )


@register(
    "udtf_python_sentences",
    oracle="""
        SELECT doc_id, CAST(i - 1 AS INT) AS sent_idx, sentence,
               CAST(length(sentence) AS INT) AS n_chars
        FROM (SELECT doc_id,
                     unnest(string_split(text, '. ')) AS sentence,
                     unnest(range(1, len(string_split(text, '. ')) + 1)) AS i
              FROM documents) d
    """,
    group="udfs",
)
def udtf_python_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-based Python UDTF (Spark 4 API): sentence-split each document
    via LATERAL, yielding (sent_idx, sentence, n_chars) rows.

    API-parity surface for the desdb user's table-function habit
    [desdb:desdb.py quick over Oracle TABLE() — reconstructed, SURVEY.md
    §2A A1]: this demonstrates the full UDTF lifecycle (class, register,
    LATERAL join in SQL). It is deliberately the ONLY Python-row-path
    table function in the registry — for anything expressible with
    explode/posexplode/split, the built-in path (udtf_explode_unnest
    above) is 10-100x faster and stays in codegen; a UDTF earns its cost
    only when per-row logic genuinely needs Python. Scale shape: the
    UDTF is embarrassingly parallel per partition, no shuffle at all.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string, n_chars int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                yield i, s, len(s)

    spark.udtf.register("sentence_split_py", SentenceSplit)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM udtf_docs, LATERAL sentence_split_py(text) s
        """
    )
