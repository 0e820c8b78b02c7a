"""Round-8: waterfilling domain caps — the per-domain token budget
allocator of production LLM data mixing (public practice: per-source
caps in LLaMA/The Pile-style recipes): given a total token budget B and
per-(source, lang) supplies s_i, find the water level θ with
``Σ min(s_i, θ) = B`` — small domains keep everything, large domains
are capped at a common level — then emit EXACT integer allocations
(floor level + largest-deterministic remainder spread) that sum to B
precisely. Complements ``corpus_temperature_mix`` (softmax reweighting)
and ``alloc_largest_remainder`` (proportional apportionment): caps are
the anti-domination guarantee neither gives.

Scale shape: one corpus scan aggregates token supply per domain
(map-side combine; the domain table is tiny — thousands of rows at
worst); the water level is found RELATIONALLY on that aggregate with
two window passes (sorted prefix sums → the standard k-search, then
remainder ranking) — no driver collect, no iteration: the O(n log n)
textbook algorithm as a plan. All arithmetic is exact integers, so the
hash proves the allocator bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Budget as a fraction of total corpus tokens (exact integer floor).
BUDGET_NUM = 2
BUDGET_DEN = 5


@register(
    "corpus_waterfill_domain_caps",
    oracle=f"""
        WITH supply AS (
            SELECT source, lang,
                   sum(len(list_filter(string_split(text, ' '),
                                       x -> x <> ''))) AS s
            FROM documents GROUP BY source, lang
        ), tot AS (
            SELECT source, lang, s,
                   (sum(s) OVER ()) * {BUDGET_NUM} // {BUDGET_DEN} AS b,
                   sum(s) OVER (ORDER BY s, source, lang
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS prefix,
                   row_number() OVER (ORDER BY s, source, lang) AS rn,
                   count(*) OVER () AS n
            FROM supply
        ), marked AS (
            -- group i keeps its whole supply iff the level needed to cap
            -- it is affordable: s_i * (remaining groups) <= remaining
            -- budget (prefix-closed in sort order = the waterfill k)
            SELECT *,
                   CASE WHEN s * (n - rn + 1) <= b - (prefix - s)
                        THEN 1 ELSE 0 END AS is_full
            FROM tot
        ), level AS (
            SELECT *,
                   sum(CASE WHEN is_full = 1 THEN s ELSE 0 END) OVER ()
                       AS full_sum,
                   sum(is_full) OVER () AS k
            FROM marked
        ), alloc0 AS (
            SELECT source, lang, s, b, is_full, rn, n, k,
                   (b - full_sum) // (n - k) AS q,
                   (b - full_sum) % (n - k) AS r
            FROM level
        )
        SELECT source, lang,
               CAST(s AS BIGINT) AS supply_tokens,
               CAST(CASE WHEN is_full = 1 THEN s
                         ELSE q + CASE WHEN rn - k <= r THEN 1 ELSE 0 END
                    END AS BIGINT) AS alloc_tokens,
               CAST(1 - is_full AS BIGINT) AS capped
        FROM alloc0
        ORDER BY source, lang
    """,
    group="waterfill_ext",
)
def corpus_waterfill_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) token allocations under a
    {BUDGET_NUM}/{BUDGET_DEN}-of-corpus budget: supplies below the water
    level are kept whole (capped = 0), the rest are capped at the floor
    level with the integer remainder spread over the first capped groups
    in sort order — allocations sum to the budget EXACTLY (pinned in
    tests/test_waterfill_ext.py)."""
    d = load_table(spark, sf_dir, "documents")
    supply = (
        d.select(
            "source",
            "lang",
            F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias(
                "nt"
            ),
        )
        .groupBy("source", "lang")
        .agg(F.sum("nt").alias("s"))
    )
    # All windows below run over the DOMAIN aggregate (tiny), not the
    # corpus — the unpartitioned frames are O(domains).
    w_all = Window.partitionBy()
    w_sorted = Window.partitionBy().orderBy("s", "source", "lang")
    w_prefix = w_sorted.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Budget and quotients below use integer DIV on DECIMAL(38,0), not
    # double division + floor (ADVICE r8): floor(x*a/b) through binary64
    # is exact only while x*a < 2^53, and a 100 TB corpus's token total
    # (~10^13) times BUDGET_NUM crosses that; DECIMAL div matches the
    # oracle's // at any scale, as the module's exactness claim requires.
    tot = supply.select(
        "source",
        "lang",
        "s",
        F.sum("s").over(w_all).alias("total_s"),
        F.sum("s").over(w_prefix).alias("prefix"),
        F.row_number().over(w_sorted).alias("rn"),
        F.count("*").over(w_all).alias("n"),
    ).withColumn(
        "b",
        F.expr(
            f"CAST((CAST(total_s AS DECIMAL(38,0)) * {BUDGET_NUM})"
            f" div {BUDGET_DEN} AS BIGINT)"
        ),
    ).drop("total_s")
    marked = tot.withColumn(
        "full",
        F.when(
            F.col("s") * (F.col("n") - F.col("rn") + 1)
            <= F.col("b") - (F.col("prefix") - F.col("s")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    level = marked.select(
        "*",
        F.sum(F.when(F.col("full") == 1, F.col("s")).otherwise(0))
        .over(w_all)
        .alias("full_sum"),
        F.sum("full").over(w_all).alias("k"),
    )
    # b, full_sum, n, k are all BIGINT and b ≥ full_sum by construction,
    # so `div` here is the oracle's floor `//` exactly (no 2^53 hazard,
    # no double round-trip). n = k (all groups full) cannot happen with
    # BUDGET < 1, and the oracle would error identically if it did.
    q = F.expr("(b - full_sum) div (n - k)")
    r = (F.col("b") - F.col("full_sum")) % (F.col("n") - F.col("k"))
    return level.select(
        "source",
        "lang",
        F.col("s").cast("bigint").alias("supply_tokens"),
        F.when(F.col("full") == 1, F.col("s"))
        .otherwise(
            q + F.when(F.col("rn") - F.col("k") <= r, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_tokens"),
        (1 - F.col("full")).cast("bigint").alias("capped"),
    ).orderBy("source", "lang")
