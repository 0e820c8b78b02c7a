"""Round-8: the dedup threshold-tuning curve — for a grid of Jaccard
thresholds, how many near-duplicate pairs fire and how many documents
survive. This is the calibration sweep a curation engineer runs before
committing a corpus-wide near-dedup pass (the dedup-tier analog of
corpus_length_retention_curve: one candidate-generation pass, the whole
grid answered from it).

One pass, grid unpivoted: candidates come from the lossless PPJoin
prefix filter at the LOWEST grid threshold (t = 1/2 — the filter lemma
guarantees no pair with Jaccard ≥ 0.5 is missed, hence no pair for ANY
grid point is missed); exact (intersection, union) sizes are computed
once per candidate, then a 5-element literal-array explode fans each
pair across the grid and an integer-rational comparison
(100·i ≥ pct·u — no float threshold, exact in both engines) selects
the qualifying rows. No join against the grid (a 5-row broadcast-
nested-loop is exactly what the plan audit bans) — the explode stays
inside whole-stage codegen.

Removal convention: for each qualifying pair the LARGER doc_id is the
removal victim (keep-first), so n_docs_removed = distinct id_b over
qualifying pairs and retention = total − removed.

Scale shape: candidate volume is the prefix filter's output at t=0.5
(heavier than t=0.9 by design — the price of sweeping low thresholds),
exact verification is candidate-bound, and the grid multiplies rows 5×
AFTER the pair set is materialized, before a tiny groupBy. The oracle
is the quadratic all-pairs sweep — tractable at driver scale, which is
the usual asymmetry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.extensions.dedup import prefix_filtered_pairs
from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Jaccard grid in integer percent (lowest first = the candidate bound).
GRID_PCT = (50, 60, 70, 80, 90)


@register(
    "dedup_jaccard_retention_curve",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
                AS tok
            FROM documents
        ), sizes AS (
            SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
            FROM toks a JOIN toks b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ), pairs AS (
            SELECT id_a, id_b, i, sa.n + sb.n - i AS u
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
        ), fanned AS (
            SELECT g.pct, p.id_a, p.id_b
            FROM pairs p, (SELECT unnest([{", ".join(map(str, GRID_PCT))}])
                           AS pct) g
            WHERE 100 * p.i >= g.pct * p.u
        )
        SELECT CAST(pct AS BIGINT) AS pct,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(count(DISTINCT id_b) AS BIGINT) AS n_docs_removed,
               CAST((SELECT count(*) FROM documents)
                    - count(DISTINCT id_b) AS BIGINT) AS n_docs_kept
        FROM fanned GROUP BY pct ORDER BY pct
    """,
    group="dedup_curve",
)
def dedup_jaccard_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per grid threshold: qualifying pair count, documents removed
    (keep-first convention), documents kept — hashed against DuckDB's
    quadratic all-pairs sweep, so the prefix filter's losslessness at
    the 0.5 bound and the exact integer threshold arithmetic are both
    inside the gate at every grid point at once.
    """
    from desdb_spark.extensions.dedup import ensure_parallelism

    d = load_table(spark, sf_dir, "documents")
    total = d.count()  # bounded driver scalar: one count, reused as a literal
    # r11 verification rework (the dup_edges treatment — and this op is
    # where it matters most: the t=0.5 candidate bound makes prefixes
    # ~half of each doc's tokens, so the candidate set dwarfs the
    # t=0.8/0.9 ops'). Candidates probe at full parallelism; token-set
    # sizes are precomputed in the checkpointed frame (AQE broadcast by
    # size stats, no forced hint); and the grid test is rewritten so
    # array_intersect evaluates ONCE per candidate:
    # 100·i ≥ pct·(s−i) ⟺ (100+pct)·i ≥ pct·s with s = nₐ+n_b, exact
    # in integers — the old (i, u=s−i) projection referenced i twice and
    # codegen computed the intersection twice. Measured at sf0.1
    # (with prefix_filtered_pairs' tok-partitioned join): 183 s → ~30 s
    # warm; the residual IS the t=0.5 bound — 11M candidates to generate
    # and verify, ~4× the t=0.8 ops' volume.
    cand = ensure_parallelism(prefix_filtered_pairs(d, t_num=1, t_den=2))
    sets_df = (
        d.select(
            F.col("doc_id").alias("id"),
            F.array_distinct(F.split("text", " ")).alias("toks"),
        )
        .select("id", "toks", F.size("toks").alias("n"))
        .localCheckpoint()
    )
    sa = sets_df.alias("sa")
    sb = sets_df.alias("sb")
    i = F.size(F.array_intersect("sa.toks", "sb.toks"))
    pairs = (
        cand.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(sb, F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            i.alias("i"),
            (F.col("sa.n") + F.col("sb.n")).alias("s"),
        )
    )
    fanned = pairs.select(
        "id_a",
        "id_b",
        "i",
        "s",
        F.explode(F.array(*[F.lit(p) for p in GRID_PCT])).alias("pct"),
    ).where((100 + F.col("pct")) * F.col("i") >= F.col("pct") * F.col("s"))
    return (
        fanned.groupBy("pct")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.countDistinct("id_b").cast("bigint").alias("n_docs_removed"),
        )
        .select(
            F.col("pct").cast("bigint").alias("pct"),
            "n_pairs",
            "n_docs_removed",
            (F.lit(total) - F.col("n_docs_removed"))
            .cast("bigint")
            .alias("n_docs_kept"),
        )
        .orderBy("pct")
    )
