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
    # r12 identical-set collapse (exact-dedup-first, the standard
    # pre-pass of the set-similarity-join literature): docs with the
    # SAME distinct-token set have pairwise Jaccard 1 and identical
    # (i, s) against every other doc, so the whole sweep runs at
    # EQUIVALENCE-CLASS grain and expands back by class sizes in the
    # final aggregate — exact, and the pair space shrinks quadratically
    # in the dup rate (fixture: 5000 docs → 3935 classes, 12.5M → 7.7M
    # class pairs; 17.4 s → ~11 s fresh-plan at sf0.1). Class identity
    # is xxhash64 over the SORTED token set — same 64-bit-collision
    # reasoning as line_dedup's keys (birthday-bounded noise at any
    # real scale, and the differential hash against the raw-text oracle
    # proves the keying changes nothing on the fixture). The class id
    # is the class's MIN doc id, which makes removal accounting exact:
    # a doc is removed at threshold t iff some SMALLER doc qualifies
    # against it — every non-min member of a class is removed by its
    # own min (within-class J=1 ≥ every grid t), and a class min m_X
    # survives iff no qualifying neighbor class has a smaller min. So
    #   n_docs_kept(t)   = #{classes X : min over qualifying neighbors
    #                       Y of id_Y > id_X}          (survivor minima)
    #   n_docs_removed(t) = total_docs − n_docs_kept(t)
    #   n_pairs(t)       = Σ_{X~Y qualifying, X<Y} c_X·c_Y
    #                      + Σ_X C(c_X, 2)            (within, every t)
    classes = (
        ensure_parallelism(d)
        .select(
            "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
        )
        .groupBy(F.xxhash64(F.sort_array("toks")).alias("h"))
        .agg(
            F.min("doc_id").alias("id"),
            F.count("*").cast("bigint").alias("c"),
            F.min_by("toks", "doc_id").alias("toks"),
        )
        .select("id", "c", "toks", F.size("toks").alias("n"))
        .localCheckpoint()
    )
    # Three bounded driver scalars in one action.
    tot = classes.agg(
        F.sum("c").alias("docs"),
        F.count("*").alias("ncls"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("bigint").alias("within"),
    ).first()
    total, n_classes, within = int(tot.docs), int(tot.ncls), int(tot.within)
    # Candidate generation over class representatives (one doc per
    # class; concat_ws re-stringifies the token set — tokens carry no
    # spaces, so prefix_tokens' re-split reproduces the set exactly).
    reps = classes.select("id", F.concat_ws(" ", "toks").alias("text"))
    cand = ensure_parallelism(
        prefix_filtered_pairs(reps, t_num=1, t_den=2, id_col="id")
    )
    sa = classes.alias("sa")
    sb = classes.alias("sb")
    # Single-eval integer grid test (r11): (100+pct)·i ≥ pct·(nₐ+n_b).
    i = F.size(F.array_intersect("sa.toks", "sb.toks"))
    pairs = (
        cand.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(sb, F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            F.col("sa.c").alias("c_a"),
            F.col("sb.c").alias("c_b"),
            i.alias("i"),
            (F.col("sa.n") + F.col("sb.n")).alias("s"),
        )
    )
    fanned = pairs.select(
        "id_a",
        "id_b",
        "c_a",
        "c_b",
        F.explode(F.array(*[F.lit(p) for p in GRID_PCT])).alias("pct"),
        "i",
        "s",
    ).where((100 + F.col("pct")) * F.col("i") >= F.col("pct") * F.col("s"))
    # Qualifying pairs are sparse post-threshold; checkpoint so the two
    # consumers below don't re-run candidate generation + verify.
    fanned = fanned.localCheckpoint()
    cross = fanned.groupBy("pct").agg(
        F.sum(F.col("c_a") * F.col("c_b")).cast("bigint").alias("cross_pairs")
    )
    # A class min is REMOVED at t iff some qualifying neighbor class has
    # a smaller id; neighbor ids ARE the neighbor minima.
    losers = (
        fanned.select("pct", F.col("id_b").alias("x"), F.col("id_a").alias("nb"))
        .unionByName(
            fanned.select(
                "pct", F.col("id_a").alias("x"), F.col("id_b").alias("nb")
            )
        )
        .groupBy("pct", "x")
        .agg(F.min("nb").alias("nbmin"))
        .where(F.col("nbmin") < F.col("x"))
        .groupBy("pct")
        .agg(F.count("*").cast("bigint").alias("lost_minima"))
    )
    # Every grid row must appear even if a pct has zero qualifying
    # CROSS pairs (within-class J=1 pairs exist at every threshold).
    grid = spark.createDataFrame([(p,) for p in GRID_PCT], "pct int")
    return (
        grid.join(cross, "pct", "left")
        .join(losers, "pct", "left")
        .select(
            F.col("pct").cast("bigint").alias("pct"),
            (F.lit(within) + F.coalesce(F.col("cross_pairs"), F.lit(0)))
            .cast("bigint")
            .alias("n_pairs"),
            (
                F.lit(total - n_classes)
                + F.coalesce(F.col("lost_minima"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_docs_removed"),
            (F.lit(n_classes) - F.coalesce(F.col("lost_minima"), F.lit(0)))
            .cast("bigint")
            .alias("n_docs_kept"),
        )
        .orderBy("pct")
    )
