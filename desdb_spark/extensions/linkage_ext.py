"""Round-6 batch-3 record linkage: blocked fuzzy matching.

Entity resolution at scale never compares all pairs — it blocks records
into small candidate groups on a cheap key and runs the expensive
similarity (edit distance) only within blocks, exactly like the minhash
band trick in extensions/dedup.py but for structured identity fields.
The fixture has no organically dirty names (part names repeat *exactly* —
probed: every d≤2 pair is d=0), so the op plants deterministic
suffix-level typos on customer names — the same planted-data pattern as
quality_gates.docs_dup_rate_by_source — and must re-link every dirty
record to its true source. Reference parity: desdb had no linkage
surface (SURVEY.md §2A — reconstructed); new engine capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "linkage_blocked_fuzzy",
    oracle="""
        WITH dirty AS (
            SELECT c_custkey AS dirty_id,
                   CASE WHEN c_custkey % 3 = 0
                        THEN c_name || 'q'
                        WHEN c_custkey % 3 = 1
                        THEN c_name || 'x'
                        ELSE substr(c_name, 1, length(c_name) - 1) || 'z'
                             || substr(c_name, length(c_name), 1)
                   END AS dirty_name
            FROM customer WHERE c_custkey % 5 = 0
        ), cand AS (
            SELECT d.dirty_id, d.dirty_name, c.c_custkey, c.c_name,
                   levenshtein(d.dirty_name, c.c_name) AS dist
            FROM dirty d
            JOIN customer c
              ON substr(d.dirty_name, 1, length(d.dirty_name) - 2)
               = substr(c.c_name, 1, length(c.c_name) - 1)
            WHERE levenshtein(d.dirty_name, c.c_name) <= 2
        )
        SELECT dirty_id, dirty_name, c_custkey AS matched_id, dist
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY dirty_id
                       ORDER BY dist, c_custkey) AS rk
            FROM cand) t
        WHERE rk = 1
    """,
    group="linkage_ext",
)
def linkage_blocked_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy linkage: every 5th customer name gets a planted
    suffix typo (last char duplicated / 'x' appended / 'z' inserted,
    keyed on custkey), and the op links each dirty record back to the
    clean roster — candidates from an equi-join on an EDIT-TOLERANT
    block key, edit-distance ≤ 2 filter, best match per dirty record by
    (distance, custkey).

    The block key is the r6 scale fix for this op: the first cut
    blocked on the 12-char name prefix, but every fixture name shares
    the literal prefix 'Customer#000' — ONE block, so the "blocked"
    join was a full cross product (3k × 15k levenshtein pairs, 138 s at
    sf0.1, quadratic in SF). The planted edits only ever touch the last
    two character positions, so dropping those positions from each side
    — dirty[1 .. len-2] vs clean[1 .. len-1] — is a key every true
    (dirty, source) pair provably shares, and it collides only
    last-digit families (~10 clean rows per block). The winner per
    dirty record is unchanged: the true source sits at distance 1 and
    no other clean name can (any other differs in a digit besides the
    edited suffix, costing ≥ 2), so narrowing candidates to the block
    cannot flip rk=1 — it only stops paying levenshtein on pairs that
    could never win. The typos are all LETTER insertions ('q'/'x'
    appended, 'z' inserted before the last char): a distance-1 roster
    neighbor must delete that letter, leaving exactly the source name,
    so recall is exactly 1.0 (asserted in tests/test_sketches_ext.py).
    Digit-level edits were probed and rejected — deleting or
    substituting a digit is equidistant to up to 10 other ids.

    Scale shape: the pair space is |block|² per block, never |roster|²;
    blocking keys here are name prefixes, in production a phonetic or
    learned key. The levenshtein evaluates only on block-collided pairs,
    inside codegen. One shuffle on the block key + one on dirty_id for
    the best-match window.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    dirty = c.where(F.col("c_custkey") % 5 == 0).select(
        F.col("c_custkey").alias("dirty_id"),
        F.when(F.col("c_custkey") % 3 == 0, F.concat("c_name", F.lit("q")))
        .when(F.col("c_custkey") % 3 == 1, F.concat("c_name", F.lit("x")))
        .otherwise(
            F.concat(
                F.expr("substr(c_name, 1, length(c_name) - 1)"),
                F.lit("z"),
                F.expr("substr(c_name, length(c_name), 1)"),
            )
        )
        .alias("dirty_name"),
    )
    cand = (
        dirty.join(
            c,
            F.expr("substr(dirty_name, 1, length(dirty_name) - 2)")
            == F.expr("substr(c_name, 1, length(c_name) - 1)"),
        )
        .withColumn("dist", F.levenshtein("dirty_name", "c_name"))
        .where(F.col("dist") <= 2)
    )
    w = W.partitionBy("dirty_id").orderBy("dist", "c_custkey")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "dirty_id",
            "dirty_name",
            F.col("c_custkey").alias("matched_id"),
            # Spark levenshtein yields int32; DuckDB bigint — align.
            F.col("dist").cast("bigint").alias("dist"),
        )
    )
