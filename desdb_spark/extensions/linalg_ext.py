"""Round-6 batch-5 distributed dense linear algebra over embeddings.

The covariance/Gram matrix XᵀX is the workhorse behind PCA whitening,
low-rank projection, and embedding-drift monitoring — and at 100 TB of
embeddings it is the textbook case for partial aggregation of a
FIXED-SIZE state: each partition reduces its n×d block to one d×d
matrix (Arrow-batched NumPy GEMM — BLAS3, the fast path), the d×d
partials sum associatively, and only d² floats ever cross the network
regardless of row count. This is exactly how MLlib's RowMatrix
computes Gram matrices (public Spark source, mllib/linalg); here it is
expressed with ``mapInPandas`` so the kernel stays NumPy.

Rows-only for the driver (a d×d float matrix has no robust bit-exact
cross-engine hash; summation order varies by partitioning on BOTH
engines); tests/test_linalg_ext.py checks the full matrix against a
single-node ``X.T @ X`` to tight relative tolerance, plus symmetry and
PSD-ness.

Reference parity: desdb had no linear-algebra surface (SURVEY.md §2A —
reconstructed); new engine capability.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


def gram_matrix(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Distributed Xᵀ X: one (i, j, value) row per upper-triangle cell.

    Stage 1 (``mapInPandas``): each Arrow batch stacks its vectors into
    an n×d float64 block and emits the d×d partial ``block.T @ block``
    flattened to upper-triangle rows — O(d²) output per TASK, however
    many rows it read. Stage 2: one groupBy on (i, j) sums the partials
    — a shuffle of (tasks × d²/2) tiny rows. Nothing else moves.
    """

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            g = block.T @ block
            acc = g if acc is None else acc + g
        if acc is not None:
            d = acc.shape[0]
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {"i": iu.astype("int32"), "j": ju.astype("int32"),
                 "value": acc[iu, ju]}
            )

    partials = emb.select(vec_col).mapInPandas(
        _partial, schema="i int, j int, value double"
    )
    return partials.groupBy("i", "j").agg(F.sum("value").alias("value"))


@register(
    "emb_gram_matrix",
    # Hash upgrade (r7): the registered Gram is computed in FIXED-POINT —
    # each per-row product e_i·e_j quantizes to integer 1e-6 units
    # BEFORE the sum, so the accumulated matrix is exact integer
    # arithmetic with no summation-order exposure on either engine (the
    # cents discipline applied to linear algebra). The float library
    # path (gram_matrix above) remains for consumers like whitening
    # where quantization noise would compound.
    oracle="""
        WITH el AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        )
        SELECT CAST(a.i - 1 AS INT) AS i, CAST(b.i - 1 AS INT) AS j,
               CAST(sum(CAST(round(a.x * b.x * 1000000, 0) AS BIGINT))
                    AS BIGINT) AS q_micros
        FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY 1, 2
    """,
    group="linalg_ext",
)
def emb_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle Gram matrix of the embeddings table (d=64 →
    2080 cells) in exact integer micro-units. The estimator for
    covariance drift monitoring: store last week's Gram, diff this
    week's, alarm on spectral movement — all from d² numbers per epoch.

    Scale shape: unchanged from the float path — each Arrow batch
    reduces its rows to one d×d integer partial (per-row products
    quantized with half-away rounding, matching both engines' round()),
    partials sum associatively, d² bigints cross the network. The
    kernel sub-chunks rows so the n×d×d quantization buffer stays
    bounded (~33 MB at 1024 rows × 64²).
    """
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")

    def _partial_q(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            for s in range(0, len(block), 1024):
                chunk = block[s : s + 1024]
                prods = chunk[:, :, None] * chunk[:, None, :]  # (n, d, d)
                q = (
                    np.sign(prods) * np.floor(np.abs(prods) * 1e6 + 0.5)
                ).astype("int64")
                g = q.sum(axis=0)
                acc = g if acc is None else acc + g
        if acc is not None:
            d = acc.shape[0]
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": iu.astype("int32"),
                    "j": ju.astype("int32"),
                    "q_micros": acc[iu, ju],
                }
            )

    partials = emb.select("embedding").mapInPandas(
        _partial_q, schema="i int, j int, q_micros long"
    )
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("q_micros").cast("bigint").alias("q_micros"))
        .orderBy("i", "j")
    )
