"""Round-8: embedding-space semantic dedup (VERDICT r7 item 3) — the
SemDeDup-style pass production LLM curation runs AFTER exact/MinHash
text dedup: two documents whose embeddings point the same way are
semantic duplicates even when no n-gram overlaps.

Hash-checkable by construction, unlike a k-means IVF composition (a
seeded iterative fit is not SQL-reproducible, so an oracle could never
recompute the same cells): the coarse partitioning here is DETERMINISTIC
sign cells — the sign bits of the first CELL_BITS dimensions, a fixed
hyperplane LSH both engines compute identically — and all candidate
scoring is same-cell pairs only, mirrored exactly in the DuckDB oracle.
The recall story is the standard LSH one (a near-dup pair splits cells
only if it straddles one of CELL_BITS fixed hyperplanes); the planted
twins are constructed to share their prefix signs, and the pytest pins
100% planted recall. The k-means IVF tier (extensions/similarity.py
ann_ivf_kmeans) remains the tunable-recall alternative where a seeded
fit is acceptable.

Float discipline ([[cross-engine-float-traps]], emb_gram_matrix
precedent): per-term products quantize to integer 1e-6 units BEFORE the
sum, so dots and norms are exact integers with no summation-order
exposure; the final cosine is one IEEE-deterministic double division +
sqrt of exact integers, rounded to 6 decimals in both engines.

Scale shape: twin synthesis and cell assignment are per-row JVM
expression work; the only shuffle is the self-join on the cell key, and
per-cell pair count is bounded by cell balance (2^CELL_BITS cells; at
the real scale raise CELL_BITS so cells stay ~constant-size, the same
knob as IVF's cell count). Survivor selection rides a window over the
pair output. No Python in the plan at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Sign-cell bits (2^6 = 64 cells; fixture cells verified balanced,
#: max ~46 of 2200 vectors per cell at sf0.1).
CELL_BITS = 6
#: Cosine threshold for "semantic duplicate" (rounded-6dp compare).
#: Organic within-cell cosines in the fixture top out at ~0.49; planted
#: twins land at ~0.9995 — clean separation.
SEM_THRESHOLD = 0.998
#: Every TWIN_STRIDE-th vector gets a planted near-duplicate twin:
#: prefix dims (the cell key) unchanged, remaining dims scaled by 0.9 —
#: same cell by construction, cosine ≈ 0.9995.
TWIN_STRIDE = 10
TWIN_OFFSET = 10_000_000

_Q = "1000000"  # 1e-6 fixed-point scale

#: Shared CTE chain ending in ``scored(ka, kb, cos_q)`` — every
#: same-cell pair of the twinned corpus with its exact fixed-point
#: cosine, BEFORE any threshold. dedup_semantic_embedding filters it at
#: SEM_THRESHOLD; semdedup_curve's threshold sweep aggregates it
#: per-candidate (extensions/semdedup_curve.py) — one definition, two
#: oracles, so the engines can never drift apart on the pair grain.
SCORED_CTE = f"""
        WITH el0 AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ), el AS (
            SELECT * FROM el0
            UNION ALL
            SELECT vec_id + {TWIN_OFFSET}, i,
                   CASE WHEN i <= {CELL_BITS} THEN x
                        ELSE x * CAST(0.9 AS DOUBLE) END
            FROM el0 WHERE vec_id % {TWIN_STRIDE} = 0
        ), cells AS (
            SELECT vec_id,
                   CAST(sum(CASE WHEN x >= 0 THEN 1 << (i - 1)
                                 ELSE 0 END) AS INT) AS cell
            FROM el WHERE i <= {CELL_BITS} GROUP BY vec_id
        ), qnorm AS (
            SELECT vec_id,
                   sum(CAST(round(x * x * {_Q}, 0) AS BIGINT)) AS qn
            FROM el GROUP BY vec_id
        ), pairs AS (
            SELECT a.vec_id AS ka, b.vec_id AS kb,
                   sum(CAST(round(a.x * b.x * {_Q}, 0) AS BIGINT)) AS qdot
            FROM el a
            JOIN el b ON a.i = b.i AND a.vec_id < b.vec_id
            JOIN cells ca ON ca.vec_id = a.vec_id
            JOIN cells cb ON cb.vec_id = b.vec_id AND ca.cell = cb.cell
            GROUP BY a.vec_id, b.vec_id
        ), scored AS (
            SELECT ka, kb,
                   round(CAST(qdot AS DOUBLE) /
                         sqrt(CAST(na.qn AS DOUBLE) *
                              CAST(nb.qn AS DOUBLE)), 6) AS cos_q
            FROM pairs
            JOIN qnorm na ON na.vec_id = ka
            JOIN qnorm nb ON nb.vec_id = kb
        )
"""


def twinned_scored_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of SCORED_CTE: every same-cell (ka < kb) pair of the
    twinned corpus with its exact fixed-point cosine ``cos_q`` — the
    candidate grain both the dedup decision list and the threshold
    sweep consume."""
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    twins = base.where(F.col("vec_id") % TWIN_STRIDE == 0).select(
        (F.col("vec_id") + TWIN_OFFSET).alias("vec_id"),
        F.expr(
            f"transform(emb, (x, i) -> IF(i < {CELL_BITS}, x, "
            "x * CAST(0.9 AS DOUBLE)))"
        ).alias("emb"),
    )
    corpus = base.unionByName(twins)
    # deterministic sign cells over the first CELL_BITS dims (transform
    # index is 0-based, matching the oracle's 1 << (i-1) for i=1-based)
    cell = F.expr(
        f"aggregate(transform(slice(emb, 1, {CELL_BITS}), "
        "(x, i) -> IF(x >= CAST(0 AS DOUBLE), shiftleft(1, i), 0)), "
        "0, (a, b) -> a + b)"
    )
    qnorm = F.expr(
        f"aggregate(transform(emb, x -> CAST(round(x * x * {_Q}, 0) AS BIGINT)), "
        "CAST(0 AS BIGINT), (a, b) -> a + b)"
    )
    prepped = corpus.select(
        "vec_id", "emb", cell.alias("cell"), qnorm.alias("qn")
    )
    a = prepped.alias("a")
    b = prepped.alias("b")
    qdot = F.expr(
        f"aggregate(zip_with(a.emb, b.emb, (x, y) -> "
        f"CAST(round(x * y * {_Q}, 0) AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    cos_q = F.round(
        qdot.cast("double")
        / F.sqrt(F.col("a.qn").cast("double") * F.col("b.qn").cast("double")),
        6,
    )
    return a.join(
        b,
        (F.col("a.cell") == F.col("b.cell"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("ka"),
        F.col("b.vec_id").alias("kb"),
        cos_q.alias("cos_q"),
    )


@register(
    "dedup_semantic_embedding",
    oracle=SCORED_CTE
    + f"""
        SELECT CAST(kb AS BIGINT) AS vec_id,
               CAST(ka AS BIGINT) AS keep_id,
               cos_q AS cos_sim
        FROM (
            SELECT ka, kb, cos_q,
                   row_number() OVER (PARTITION BY kb ORDER BY ka) AS rn
            FROM scored
            WHERE cos_q >= CAST({SEM_THRESHOLD} AS DOUBLE))
        WHERE rn = 1
    """,
    group="dedup_semantic",
)
def dedup_semantic_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic duplicates over the (twinned) embedding corpus: for every
    vector that has a same-cell partner with cosine ≥ SEM_THRESHOLD and a
    smaller vec_id, report the minimum such partner as its survivor
    (``keep_id``) plus the exact fixed-point cosine — the "delete this,
    keep that" decision list a SemDeDup pass feeds downstream.
    """
    scored = twinned_scored_pairs(spark, sf_dir).where(
        F.col("cos_q") >= F.lit(SEM_THRESHOLD)
    )
    w = Window.partitionBy("kb").orderBy("ka")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("kb").cast("bigint").alias("vec_id"),
            F.col("ka").cast("bigint").alias("keep_id"),
            F.col("cos_q").alias("cos_sim"),
        )
    )
