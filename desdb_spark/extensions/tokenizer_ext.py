"""Round-6 batch-5 tokenizer-training primitives.

The first step of training a BPE tokenizer (Sennrich et al. 2016,
public literature) over a 100 TB corpus is a distributed count of
adjacent symbol pairs — at bootstrap, adjacent CHARACTER pairs within
words. It is also the step that dominates cost, so its Spark shape
matters: explode words, explode each word's overlapping char bigrams
with a higher-order ``transform`` over a ``sequence`` (pure codegen —
no Python), and count. The merge loop on top of this count is
iterative driver logic over a shrinking pair table; the counting
primitive here is the 100 TB-scale part.

``text_bigram_topk`` (extensions/text_ext.py) counts adjacent WORD
pairs; this op counts characters WITHIN words — the other granularity,
and the one BPE actually starts from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "text_bpe_pair_freq",
    oracle="""
        WITH words AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ), pairs AS (
            SELECT unnest(list_transform(
                       generate_series(1, length(w) - 1),
                       s -> substring(w, s, 2))) AS pair
            FROM words
            WHERE length(w) >= 2
        )
        SELECT pair, CAST(count(*) AS BIGINT) AS freq
        FROM pairs GROUP BY pair
        ORDER BY freq DESC, pair LIMIT 30
    """,
    group="tokenizer_ext",
)
def text_bpe_pair_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 adjacent character pairs within corpus words — the first
    merge-candidate table of BPE tokenizer training, with a total
    (freq desc, pair) order so the result is deterministic.

    Scale shape: split + explode + a ``transform(sequence(...))``
    higher-order lambda emit the overlapping bigrams entirely inside
    whole-stage codegen (zero Python); the count is map-side
    combinable over a small key space (alphabet², so partial
    aggregation collapses each task's output to at most a few thousand
    rows no matter the corpus size), and the top-30 is a
    TakeOrderedAndProject. This is the degenerate-cardinality groupBy
    where 100 TB in means kilobytes shuffled.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("w")).where(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .orderBy(F.desc("freq"), "pair")
        .limit(30)
    )
