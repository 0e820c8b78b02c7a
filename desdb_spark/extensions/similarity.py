"""Similarity search over embedding columns (SURVEY.md §2B north-star).

Two tiers:

- Brute-force exact cosine top-k: the correctness baseline. The pairwise
  dot product is pure JVM expression work (``zip_with`` + ``aggregate``)
  — no UDF, no collect.
- LSH-bucketed ANN (random hyperplane signatures): the 100 TB path. Sign
  bits of R random projections form a bucket key; the candidate join is an
  equi-join on (band, signature), so work scales with bucket occupancy,
  not N². Hyperplanes are generated from a fixed seed and broadcast as
  literal arrays — deterministic across runs/executors.

At real scale the exact tier runs *within* buckets produced by the ANN
tier (or IVF cells from a k-means fit via pyspark.ml); the fixture-scale
ops keep both tiers independently checkable.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a codegen'd expression (inputs cast to double upstream)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _pairs(e: DataFrame) -> DataFrame:
    """All (a<b) embedding pairs with cosine similarity, rounded to 6 dp."""
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").cast("array<double>").alias("ea")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").cast("array<double>").alias("eb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cos_sim"),
        )
    )


#: Hard bound on the exact tier's driver-collected index. 2M × 64-dim
#: float64 ≈ 1 GiB on the driver — beyond that the exact tier is the wrong
#: tool and the caller must bucket first (ann_lsh_bucketed / ann_ivf_kmeans
#: run the same GEMM kernel *within* LSH buckets / IVF cells).
MAX_EXACT_INDEX_ROWS = 2_000_000

#: Broadcast index memo keyed by (spark application id, sf_dir): the exact
#: tier collects + broadcasts the index ONCE per session instead of on
#: every invocation (the r1 bench paid 4 collects + 4 broadcasts).
_INDEX_CACHE: dict = {}


def _embedding_index(spark: SparkSession, sf_dir: str):
    """(ids, matrix, norms) broadcast for the exact GEMM tier, memoized."""
    import numpy as np

    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    if n > MAX_EXACT_INDEX_ROWS:
        raise ValueError(
            f"embeddings has {n} rows > MAX_EXACT_INDEX_ROWS={MAX_EXACT_INDEX_ROWS}: "
            "the exact knn tier collects the index to the driver; use "
            "ann_lsh_bucketed or ann_ivf_kmeans at this scale"
        )
    idx = e.select("vec_id", F.col("embedding").cast("array<double>").alias("emb")).toPandas()
    ids = idx["vec_id"].to_numpy()
    M = np.stack(idx["emb"].to_numpy())
    norms = np.linalg.norm(M, axis=1)
    bc = spark.sparkContext.broadcast((ids, M, norms))
    _INDEX_CACHE[key] = bc
    return bc


@register(
    "knn_cosine_topk",
    oracle="""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ORDER BY cos_sim DESC, vec_a, vec_b
        LIMIT 50
    """,
    group="similarity",
)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-50 most-similar pairs, exact, via blocked matrix multiply.

    The scale pattern: the index side (ids, matrix, norms) is broadcast
    once per session (memoized; hard-capped at MAX_EXACT_INDEX_ROWS); each
    Arrow batch of query vectors computes a dense
    block × indexᵀ GEMM in NumPy, keeps its local top-k, and the global
    top-k is a cheap merge of N_batches × k candidate rows. ~100× faster
    than per-pair expression evaluation, and exactly the blocked shape
    that scales out (when the index outgrows memory, LSH/IVF partitions it
    — see ann_lsh_bucketed). Ordered by the *rounded* similarity + ids so
    the limit boundary is deterministic across engines (SURVEY.md §5.3).
    """
    import numpy as np

    k = 50
    e = load_table(spark, sf_dir, "embeddings")
    bc = _embedding_index(spark, sf_dir)

    def block_topk(batches):
        import pandas as pd

        b_ids, b_M, b_norms = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            q_ids = pdf["vec_id"].to_numpy()
            Q = np.stack(pdf["emb"].to_numpy())
            S = (Q @ b_M.T) / np.outer(np.linalg.norm(Q, axis=1), b_norms)
            # DuckDB-compatible round-half-away-from-zero at 6 dp.
            S = np.sign(S) * np.floor(np.abs(S) * 1e6 + 0.5) / 1e6
            # a < b only (no self/dup pairs): invalidate the rest in place
            # (cosine is always >= -1, so -2 never wins a top-k slot).
            S[q_ids[:, None] >= b_ids[None, :]] = -2.0
            # Per-row tie-safe top-k: every global-top-k pair (a, b) must
            # rank in the top k of row a by value, so keeping each row's
            # pairs with sim >= its k-th largest (boundary ties included)
            # preserves exactness while shrinking the final lexsort from
            # nq*ni pairs to ~nq*k.
            if S.shape[1] > k:
                kth = np.partition(S, S.shape[1] - k, axis=1)[:, S.shape[1] - k]
                keep = (S >= kth[:, None]) & (S > -2.0)
            else:
                keep = S > -2.0
            qi, bj = np.nonzero(keep)
            a, b, s = q_ids[qi], b_ids[bj], S[qi, bj]
            order = np.lexsort((b, a, -s))[:k]  # local top-k, ties by ids
            yield pd.DataFrame({"vec_a": a[order], "vec_b": b[order], "cos_sim": s[order]})

    # Spread the query side across the cluster before the GEMM: a small
    # fixture file arrives as 1 input split, which would serialize the
    # whole kernel through one task. The shuffled payload is just
    # (id, vector) — cheap at any scale — and each partition's GEMM runs
    # in parallel against the broadcast index.
    nparts = spark.sparkContext.defaultParallelism
    blocks = (
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .repartition(nparts)
        .mapInPandas(block_topk, schema="vec_a bigint, vec_b bigint, cos_sim double")
    )
    return blocks.orderBy(F.col("cos_sim").desc(), "vec_a", "vec_b").limit(k)


@register(
    "dedup_embedding_cosine",
    oracle="""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 6) >= 0.45
    """,
    group="similarity",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim ≥ 0.45).

    The fixture embeddings are near-random (max pairwise cosine ≈ 0.6 at
    sf0.1), so the threshold sits where the fixture has real pairs; a
    production near-dup pass would use ≥ 0.95.

    The threshold compares the rounded value so the cut is identical in
    both engines.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return _pairs(e).where(F.col("cos_sim") >= 0.45)


def hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-normal random hyperplanes (seeded PRNG)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(num_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_signature(emb: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of the embedding against each hyperplane."""
    bits = [
        F.when(dot(emb, F.array(*[F.lit(w) for w in p])) >= 0, "1").otherwise("0")
        for p in planes
    ]
    return F.concat(*bits)


@register("ann_lsh_bucketed", group="similarity")  # rows-only: approximate output
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN near-neighbor pairs via random-hyperplane LSH bands.

    8 bands × 4 sign bits: vectors agreeing on all bits of any band become
    candidates (equi-join on the band signature), then exact cosine filters
    at ≥ 0.45. Band geometry is tuned for the fixture's weak-similarity
    regime (p_agree ≈ 0.65 per bit at sim 0.45 → ~0.8 recall); with real
    near-dups (sim ≥ 0.95) fewer, wider bands prune far harder. Recall vs
    the exact op is asserted in tests/test_extensions.py.
    """
    e = load_table(spark, sf_dir, "embeddings")
    dim = 64
    bands, bits = 8, 4
    planes = hyperplanes(dim, bands * bits)
    emb = F.col("embedding").cast("array<double>")
    sigs = e.select(
        F.col("vec_id").alias("id"),
        emb.alias("emb"),
        F.posexplode(
            F.array(
                *[
                    lsh_signature(emb, planes[b * bits : (b + 1) * bits])
                    for b in range(bands)
                ]
            )
        ).alias("band", "sig"),
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("vec_a"),
            F.col("b.id").alias("vec_b"),
            F.round(cosine(F.col("a.emb"), F.col("b.emb")), 6).alias("cos_sim"),
        )
        .distinct()
    )
    return cand.where(F.col("cos_sim") >= 0.45).orderBy("vec_a", "vec_b")


@register("ann_ivf_kmeans", group="similarity")  # rows-only: approximate output
def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: k-means cells (pyspark.ml, seeded) + within-cell search.

    The inverted-file pattern: a k-means fit partitions vectors into
    coarse cells; each query searches only its own cell's vectors via the
    same blocked-GEMM kernel as knn_cosine_topk. At 100 TB the fit runs on
    a sample, cells become the shuffle key, and nprobe>1 adds neighbor
    cells for recall — here nprobe=1 with k=8 cells on the fixture.
    Returns per-vector nearest in-cell neighbor (vec_id, nn_id, cos_sim).
    """
    import numpy as np
    import pandas as pd
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    model = KMeans(k=8, seed=42, maxIter=10).fit(vecs.select("features"))
    assigned = model.transform(vecs).select(
        "vec_id", "emb", F.col("prediction").alias("cell")
    )

    def cell_nn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(columns=["vec_id", "nn_id", "cos_sim"]).astype(
                {"vec_id": "int64", "nn_id": "int64", "cos_sim": "float64"}
            )
        ids = pdf["vec_id"].to_numpy()
        M = np.stack(pdf["emb"].to_numpy())
        n = np.linalg.norm(M, axis=1)
        S = (M @ M.T) / np.outer(n, n)
        np.fill_diagonal(S, -2.0)
        S = np.sign(S) * np.floor(np.abs(S) * 1e6 + 0.5) / 1e6
        # Deterministic argmax: highest sim, lowest id on ties.
        order = np.lexsort((np.broadcast_to(ids, S.shape), -S), axis=1)
        best = order[:, 0]
        return pd.DataFrame(
            {"vec_id": ids, "nn_id": ids[best], "cos_sim": S[np.arange(len(ids)), best]}
        )

    return (
        assigned.groupBy("cell")
        .applyInPandas(cell_nn, schema="vec_id bigint, nn_id bigint, cos_sim double")
        .orderBy("vec_id")
    )
