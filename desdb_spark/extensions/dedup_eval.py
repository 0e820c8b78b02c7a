"""Round-8: approximate-dedup quality audit — the measurement a team
runs BEFORE trusting an LSH config on a real corpus: how much of the
exact-tier truth does the MinHash tier recover, and at what candidate
cost? (The ANN analogue is extensions/ann_eval.py; this is the same
telemetry for the dedup cascade.)

Truth = the PPJoin prefix-filtered exact tier at t = 0.8 (provably
lossless at the threshold, so it IS the ground truth); approx = the
banded MinHash tier at the same threshold. Both sides Jaccard-verify
their candidates, so approx ⊆ truth and the audit reduces to exact
set arithmetic on (id_a, id_b) pair keys — recall, miss count, and
candidate efficiency (verified / generated, the shuffle-waste number).

Scale shape: both tiers are the already-audited candidate-bound paths
(no all-pairs anywhere); the comparison itself is one left_anti join on
the pair key plus three counts folded into a single-row report. At
100 TB you run this on a sampled stratum, not the full corpus — the op
takes the whole fixture because the fixture IS the sample.

Rows-only: MinHash signatures come from seeded xxhash64 permutations
DuckDB cannot reproduce; tests/test_dedup_r8.py pins the invariants
(approx ⊆ truth, exact count identity, planted-exact-dup recall = 1,
measured overall recall above the configured floor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.extensions.dedup import (
    minhash_candidate_pairs,
    ngram_jaccard,
    prefix_filtered_pairs,
)
from desdb_spark.registry import register
from desdb_spark.session import load_table

THRESHOLD_NUM, THRESHOLD_DEN = 4, 5  # t = 0.8, dedup_near_minhash's knob


@register("dedup_minhash_eval", group="dedup_eval")  # rows-only: seeded hashes
def dedup_minhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row audit of the MinHash tier against exact truth at t=0.8:
    (n_truth, n_lsh_candidates, n_lsh_verified, n_missed, recall_micros,
    candidate_efficiency_micros). recall_micros = 1e6·verified/truth —
    exact integer inputs, one deterministic division.
    """
    d = load_table(spark, sf_dir, "documents")
    t = float(THRESHOLD_NUM) / THRESHOLD_DEN

    exact_cand = prefix_filtered_pairs(d, t_num=THRESHOLD_NUM, t_den=THRESHOLD_DEN)
    truth = (
        ngram_jaccard(d, exact_cand)
        .where(F.col("jaccard") >= t)
        .select("id_a", "id_b")
    )
    lsh_cand = minhash_candidate_pairs(d)
    verified = (
        ngram_jaccard(d, lsh_cand.select("id_a", "id_b"))
        .where(F.col("jaccard") >= t)
        .select("id_a", "id_b")
    )
    # ONE action for every number: truth and verified merge on the pair
    # key (full outer), the raw candidate stream unions in as its own
    # tag, and a single aggregate reads all four counts — the expensive
    # candidate-generation plans execute exactly once each.
    tagged = (
        truth.withColumn("in_truth", F.lit(1))
        .join(
            verified.withColumn("in_v", F.lit(1)),
            ["id_a", "id_b"],
            "full_outer",
        )
        .select(
            F.coalesce("in_truth", F.lit(0)).alias("in_truth"),
            F.coalesce("in_v", F.lit(0)).alias("in_v"),
            F.lit(0).alias("in_cand"),
        )
    )
    u = tagged.unionByName(
        lsh_cand.select(
            F.lit(0).alias("in_truth"),
            F.lit(0).alias("in_v"),
            F.lit(1).alias("in_cand"),
        )
    )
    row = u.agg(
        F.sum("in_truth").alias("nt"),
        F.sum("in_v").alias("nv"),
        F.sum(
            ((F.col("in_truth") == 1) & (F.col("in_v") == 0)).cast("long")
        ).alias("nm"),
        F.sum("in_cand").alias("nc"),
    ).first()
    n_truth, n_verified, n_missed, n_cand = (
        int(row.nt), int(row.nv), int(row.nm), int(row.nc),
    )
    recall_micros = (1_000_000 * n_verified) // max(n_truth, 1)
    eff_micros = (1_000_000 * n_verified) // max(n_cand, 1)
    return spark.createDataFrame(
        [
            (
                n_truth,
                n_cand,
                n_verified,
                n_missed,
                recall_micros,
                eff_micros,
            )
        ],
        "n_truth bigint, n_lsh_candidates bigint, n_lsh_verified bigint, "
        "n_missed bigint, recall_micros bigint, candidate_efficiency_micros bigint",
    )
