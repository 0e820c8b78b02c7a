"""Round-6 batch-3 mergeable-sketch aggregates.

At 100 TB, exact global statistics that require holding the key space
(distinct counts, frequency tables) get replaced by *mergeable sketches*:
each partition builds a small bounded-memory summary, summaries merge
associatively, and the final answer carries a proven error bound. Spark
ships Apache DataSketches HLL natively (``hll_sketch_agg`` /
``hll_union_agg`` — public API since 3.5) and a frequent-items pass
(``DataFrame.stat.freqItems``, the Karp–Papadimitriou–Shenker one-pass
algorithm). Reference parity: desdb had no sketch surface (SURVEY.md §2A
— reconstructed); new engine capability.

Both ops are rows-only for the driver (sketch internals are
engine-specific, so no DuckDB hash oracle can exist); their error bounds
against exact answers are pinned in tests/test_sketches_ext.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register("agg_hll_sketch_union", group="sketches_ext")  # rows-only: sketch
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type AND re-derived overall, computed the
    mergeable way: one HLL sketch per event_type (partial per partition,
    merged by key), then ``hll_union_agg`` folds the per-type sketches
    into the global sketch WITHOUT rescanning events — the exact pattern
    of a 100 TB daily rollup where per-segment sketches are stored and
    any segment union is answerable later from kilobytes.

    Output: one row per event_type with its estimate, plus an '__all__'
    row whose estimate comes from the union of the per-type sketches.
    Deterministic (DataSketches HLL is input-deterministic), but
    engine-specific — hence rows-only; the ≤2% error vs exact
    count(DISTINCT) is pinned in tests.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    per_type.persist()
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").cast("bigint").alias("approx_users"),
    )
    overall = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias(
            "approx_users"
        )
    ).select(F.lit("__all__").alias("event_type"), "approx_users")
    return typed.unionAll(overall)


@register("agg_freq_items_sketch", group="sketches_ext")  # rows-only: sketch
def agg_freq_items_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass frequent-items candidates over the corpus vocabulary:
    every word whose frequency can exceed 2% support survives the KPS
    counter sweep (``stat.freqItems`` guarantees a SUPERSET of the true
    heavy hitters — false positives possible, false negatives never).
    Output: one row, the sorted candidate array — the cheap first pass
    whose survivors a second exact-count pass would confirm at scale.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word")).where(
        F.col("word") != ""
    )
    cand = words.stat.freqItems(["word"], support=0.02)
    return cand.select(
        F.array_sort(F.col("word_freqItems")).alias("heavy_hitter_candidates")
    )
