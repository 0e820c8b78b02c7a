"""ANN quality evaluation, round 5 batch 3: recall of the approximate
similarity tiers against the exact tier — the go/no-go report every ANN
deployment needs before trading recall for cost at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register


@register("ann_recall_report", group="ann_eval")  # rows-only: derived from ANN tiers
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@1 of the IVF tier against exact nearest neighbors: for every
    vector, does ``ann_ivf_kmeans``'s reported neighbor match the true
    top-1 (or tie its similarity)? One summary row:
    (n_vectors, n_evaluated, exact_match, sim_match, recall_at_1).

    sim_match (tie-tolerant at 6 dp — the rounding both tiers emit)
    is the honest metric: distinct vectors at identical similarity are
    interchangeable as "the" nearest neighbor.

    Scale shape: both inputs are the SAME registered IVF machinery — the
    exact side sets nprobe ≥ the cell count, which by construction
    degenerates multi-probe search to exhaustive exact NN (asserted in
    tests/test_extensions.py), so no separate exact kernel and no cross
    join exist anywhere. The evaluation itself is one equi-join on
    vec_id plus one aggregate — at 100 TB this report runs on a SAMPLE
    of queries (per-vector join, sampling composes trivially); the
    full-corpus exact side is fixture-affordable only.
    """
    from desdb_spark.extensions.similarity import ann_ivf_kmeans

    # Deterministic 20% query sample (vec_id ≡ 0 mod 5): the report's
    # cost is dominated by the exhaustive exact side, which scales with
    # the query sample, not the corpus — the production sampling pattern
    # made concrete. The INDEX side stays complete in both tiers.
    sample = F.col("vec_id") % 5 == 0
    exact = ann_ivf_kmeans(
        spark, sf_dir, nprobe=1_000_000, probe_pred=sample
    ).select(
        "vec_id",
        F.col("nn_id").alias("exact_nn"),
        F.col("cos_sim").alias("exact_sim"),
    )
    approx = ann_ivf_kmeans(spark, sf_dir, probe_pred=sample).select(
        "vec_id",
        F.col("nn_id").alias("ivf_nn"),
        F.col("cos_sim").alias("ivf_sim"),
    )
    # LEFT join from the exact side: a query vector the IVF tier returns
    # no neighbor for is a MISS, not a row to silently drop — recall's
    # denominator is every evaluated query, so coverage gaps show up as
    # lost recall instead of vanishing from the report.
    joined = exact.join(approx, "vec_id", "left")
    hit = F.col("ivf_sim").isNotNull() & (
        F.round("ivf_sim", 6) >= F.round("exact_sim", 6)
    )
    return joined.agg(
        F.count("*").alias("n_vectors"),
        F.count("ivf_nn").alias("n_evaluated"),
        F.sum((F.col("ivf_nn") == F.col("exact_nn")).cast("bigint")).alias(
            "exact_match"
        ),
        F.sum(hit.cast("bigint")).alias("sim_match"),
        F.round(F.avg(hit.cast("double")), 4).alias("recall_at_1"),
    )
