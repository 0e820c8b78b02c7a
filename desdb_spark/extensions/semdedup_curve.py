"""Round-8e: SemDeDup threshold sweep — the epsilon-tuning curve for
embedding-space dedup (Abbas et al., SemDeDup, public arXiv 2303.09540:
the headline knob is the cosine threshold, and the paper's method is
exactly "sweep it and read the retention curve").

`dedup_semantic_embedding` answers "who is removed at THE threshold";
this op answers "how much corpus survives at EVERY candidate threshold"
— the report a curation run reads before committing to one. Both
consume the identical same-cell scored-pair grain
(dedup_semantic.SCORED_CTE / twinned_scored_pairs), so the sweep is
guaranteed consistent with the decision list it calibrates.

All comparisons happen in integer micros of the 6-dp-rounded cosine
(both engines round the same IEEE double the same way), and every curve
point comes from ONE conditional aggregate over the per-candidate max —
adding thresholds costs nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.extensions.dedup_semantic import (
    SCORED_CTE,
    TWIN_STRIDE,
    twinned_scored_pairs,
)
from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Cosine thresholds (integer micros) for the sweep. Organic same-cell
#: cosines in the fixture top out ~0.49; planted twins sit ~0.9995 —
#: the grid brackets both regimes so the curve has a visible knee.
THRESHOLDS_MICROS = (300_000, 500_000, 990_000, 999_000, 999_800)


@register(
    "dedup_semantic_retention_curve",
    oracle=SCORED_CTE
    + f"""
        , per_kb AS (
            SELECT kb,
                   max(CAST(round(cos_q * 1000000, 0) AS BIGINT)) AS mx
            FROM scored GROUP BY kb
        ), totals AS (
            SELECT (SELECT count(*) FROM embeddings)
                 + (SELECT count(*) FROM embeddings
                    WHERE vec_id % {TWIN_STRIDE} = 0) AS n_total
        ), one AS (
            SELECT {", ".join(
                f"CAST(sum(CASE WHEN mx >= {t} THEN 1 ELSE 0 END)"
                f" AS BIGINT) AS rm{t}"
                for t in THRESHOLDS_MICROS
            )}
            FROM per_kb
        )
        SELECT threshold_micros, n_removed,
               CAST(n_total AS BIGINT) AS n_total,
               CAST((n_total - n_removed) * 1000000 // n_total AS BIGINT)
                   AS retention_micros
        FROM (
            {" UNION ALL ".join(
                f"SELECT CAST({t} AS INTEGER) AS threshold_micros,"
                f" rm{t} AS n_removed FROM one"
                for t in THRESHOLDS_MICROS
            )}
        ) CROSS JOIN totals
        ORDER BY threshold_micros
    """,
    group="semdedup_curve",
)
def dedup_semantic_retention_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus retention at each candidate SemDeDup threshold: a vector
    is removed at threshold T iff its best same-cell smaller-id partner
    has cosine ≥ T (micros compare), so ``n_removed`` is monotone
    non-increasing in T and retention is the complement share in exact
    floor micros.

    Scale shape: the expensive stage — the same-cell pair join — runs
    ONCE for the whole sweep; it reduces to a per-candidate max (one
    shuffle, map-side combine) and a single conditional aggregate emits
    every curve point, unpivoted via ``stack``. n_total is an exact
    integer fitted driver scalar (one tiny action), never a 1-row
    crossJoin. At 100 TB the sweep therefore costs exactly one SemDeDup
    candidate pass — which is why you always compute the curve, not a
    single point, before deleting anything.
    """
    scored = twinned_scored_pairs(spark, sf_dir)
    per_kb = (
        scored.select(
            "kb",
            F.round(F.col("cos_q") * 1000000, 0)
            .cast("bigint")
            .alias("cm"),
        )
        .groupBy("kb")
        .agg(F.max("cm").alias("mx"))
    )
    e = load_table(spark, sf_dir, "embeddings")
    counts = e.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("vec_id") % TWIN_STRIDE == 0, 1).otherwise(0)
        ).alias("tw"),
    ).collect()[0]
    n_total = int(counts.n) + int(counts.tw)
    one = per_kb.agg(
        *[
            F.sum(F.when(F.col("mx") >= t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"rm{t}")
            for t in THRESHOLDS_MICROS
        ]
    )
    stack = ", ".join(f"{t}, rm{t}" for t in THRESHOLDS_MICROS)
    return (
        one.select(
            F.expr(
                f"stack({len(THRESHOLDS_MICROS)}, {stack})"
                " as (threshold_micros, n_removed)"
            )
        )
        .select(
            F.col("threshold_micros").cast("int").alias("threshold_micros"),
            "n_removed",
            F.lit(n_total).cast("bigint").alias("n_total"),
            F.floor(
                (F.lit(n_total) - F.col("n_removed"))
                * 1000000
                / F.lit(n_total)
            )
            .cast("bigint")
            .alias("retention_micros"),
        )
        .orderBy("threshold_micros")
    )
