"""Round-6 batch-2 training-prep op: curriculum bucketing — ordering a
corpus by a quality score and cutting it into staged training buckets
(easy/clean first, noisy tail last), the standard curriculum-learning
data layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "docs_curriculum_buckets",
    oracle="""
        WITH scored AS (
            SELECT doc_id, lang,
                   round(n_chars / (1.0 + abs(5.0 - CAST(n_chars AS DOUBLE)
                       / (length(text) - length(replace(text, ' ', '')) + 1))), 4)
                       AS quality_score
            FROM documents)
        SELECT doc_id, lang, quality_score,
               CAST(ntile(10) OVER (ORDER BY quality_score DESC, doc_id)
                    AS BIGINT) AS curriculum_bucket
        FROM scored
    """,
    group="curriculum",
)
def docs_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document a curriculum bucket: a deterministic quality
    score (length damped by distance from the ideal ~5 chars/word shape),
    then ntile(10) over the total (score DESC, doc_id) order — bucket 1
    is the cleanest tranche a staged training run consumes first. The
    score formula is plain arithmetic stated identically in both engines,
    so the row-level bucket assignment is hash-checked end to end.

    Scale shape: the global ntile needs a total order — a single-partition
    window, the honest cost of exact global deciles. At 100 TB swap the
    exact ntile for bucketing by percentile_approx cutpoints (one
    aggregate + a broadcast map join), which this op's score column
    feeds unchanged; the exact form stays the correctness oracle.
    """
    d = load_table(spark, sf_dir, "documents")
    n_tokens = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    )
    score = F.round(
        F.col("n_chars")
        / (
            1.0
            + F.abs(F.lit(5.0) - F.col("n_chars").cast("double") / n_tokens)
        ),
        4,
    )
    scored = d.select("doc_id", "lang", score.alias("quality_score"))
    w = Window.orderBy(F.col("quality_score").desc(), "doc_id")
    return scored.select(
        "doc_id",
        "lang",
        "quality_score",
        F.ntile(10).over(w).cast("bigint").alias("curriculum_bucket"),
    )
