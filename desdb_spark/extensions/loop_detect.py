"""Round-9: degenerate-loop detection — the "model stuck in a loop"
filter for synthetic/model-generated text (public practice: repetition
penalties exist precisely because LMs emit `the the the` / `a b a b`
tails; corpora scraped from model output need the reverse filter).
``text_repetition_score`` (Gopher top-token share) catches
high-frequency SINGLE tokens; this op catches PERIODIC structure at
lags 1..{MAX_LAG}: for each lag L, the share of positions i with
t[i] = t[i+L]. A doc looping with period L scores ≈ 1 at lag L even
when every individual token's share is only 1/L — invisible to the
top-token rule.

Scale shape: entirely codegen — per doc, {MAX_LAG} filtered-sequence
counts over the token array (O(L·n) comparisons per doc, no explode, no
shuffle except the final top-N). Exact integers: match counts and
floor-micros rates; the best lag is the smallest lag attaining the
maximal rate (struct-max tie-break mirrored in the oracle's window
ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Longest period checked; docs with <= MAX_LAG + 1 tokens are too short
#: to score and are excluded (both engines).
MAX_LAG = 4
#: Flag threshold: >= half the comparable positions repeat at the best
#: lag (exact integer micros).
LOOP_MICROS = 500_000


@register(
    "text_loop_periodicity",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), ok AS (
            SELECT doc_id, t, len(t) AS n FROM toks
            WHERE len(t) > {MAX_LAG + 1}
        ), lagged AS (
            SELECT doc_id, n, lag.l AS lag,
                   len(list_filter(range(1, n - lag.l + 1),
                                   i -> t[i] = t[i + lag.l])) AS m
            FROM ok, (SELECT unnest(generate_series(1, {MAX_LAG})) AS l)
                      lag
        ), rated AS (
            SELECT doc_id, n, lag, m,
                   CAST(m * 1000000 // (n - lag) AS BIGINT) AS rate,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY m * 1000000 // (n - lag) DESC, lag) AS rn
            FROM lagged
        )
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_tokens,
               CAST(lag AS BIGINT) AS best_lag,
               CAST(m AS BIGINT) AS n_matches,
               rate AS loop_rate_micros,
               CAST(CASE WHEN rate >= {LOOP_MICROS} THEN 1 ELSE 0 END
                    AS BIGINT) AS looping
        FROM rated WHERE rn = 1
        ORDER BY doc_id
    """,
    group="loop_detect",
)
def text_loop_periodicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: the lag in 1..{MAX_LAG} with the highest share of
    self-matching positions (smallest lag wins rate ties), the exact
    match count, the rate in floor micros, and the looping flag at
    {LOOP_MICROS} micros — degenerate `a b a b ...` output scores ≈ 1 at
    its period."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    t = F.col("t")
    n = F.size(t)
    base = d.select("doc_id", toks.alias("t")).where(F.size("t") > MAX_LAG + 1)

    def lag_stat(lag: int):
        m = F.size(
            F.filter(
                F.sequence(F.lit(1), n - lag),
                lambda i: F.element_at(t, i) == F.element_at(t, i + lag),
            )
        ).cast("long")
        # Exact integer floor division as (a - a % b) / b: the quotient
        # is integral and per-doc-bounded (≪ 2^53), so the final double
        # division is exact — no corpus-scale 2^53 hazard exists at the
        # per-document grain. rate first, then NEGATED lag: struct max =
        # highest rate, smallest lag — the oracle's (rate DESC, lag ASC)
        # row_number.
        num = m * F.lit(1_000_000)
        den = (n - lag).cast("long")
        rate = ((num - num % den) / den).cast("long")
        return F.struct(
            rate.alias("rate"),
            F.lit(-lag).cast("long").alias("neg_lag"),
            m.alias("m"),
        )

    best = F.greatest(*[lag_stat(lag) for lag in range(1, MAX_LAG + 1)])
    return (
        base.select("doc_id", n.cast("bigint").alias("n_tokens"), best.alias("b"))
        .select(
            "doc_id",
            "n_tokens",
            (-F.col("b.neg_lag")).cast("bigint").alias("best_lag"),
            F.col("b.m").cast("bigint").alias("n_matches"),
            F.col("b.rate").cast("bigint").alias("loop_rate_micros"),
            F.when(F.col("b.rate") >= LOOP_MICROS, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("looping"),
        )
        .orderBy("doc_id")
    )
