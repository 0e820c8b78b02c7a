"""Round-8c: asymmetric containment dedup — the near-dup class Jaccard
misses. A short document quoted inside a long one (a syndicated article
inside a portal page, a README pasted into a mega-doc) has LOW Jaccard
(the union is dominated by the long side) but HIGH overlap coefficient
|A∩B| / min(|A|,|B|) — the Szymkiewicz–Simpson measure; containment-
grain dedup is the standard complement to `dedup_ngram_jaccard` in
web-corpus curation (public algorithm family: Broder's shingling +
containment, SSJoin/PPJoin prefix filtering).

Keys are word-3-gram shingles, not unigram tokens: with a small
vocabulary every doc's token SET is near-identical, while shingles
carry order and keep document frequency flat — the reason shingling is
the standard containment key.

Candidate generation is LOSSLESS at the threshold: intersection ≥
t·min(|A|,|B|) forces the SMALLER set to share one of its
k = |S| − ⌈t·|S|⌉ + 1 globally-rarest shingles with the other set (if
all k missed, intersection ≤ |S| − k = ⌈t·|S|⌉ − 1 < t·|S|). Each
doc's k-prefix (rarest shingles by global df, ties by shingle) joins
the FULL inverted index, so whichever side of a qualifying pair is
smaller, its prefix-vs-full probe emits the pair. Exact verification
(array_intersect over the two shingle sets) runs on candidates only.

Scale shape: candidate volume is Σ_g prefix_df(g)·df(g) — the prefix
keeps frequent shingles out of the probe side, and 3-gram df has no
stopword spikes; verification is candidate-bound. The full-index side
is the price of asymmetry (Jaccard's symmetric filter can prefix BOTH
sides); it shuffles (gram, id) pairs only, never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Containment threshold t = T_NUM / T_DEN over min(|A|, |B|).
T_NUM = 9
T_DEN = 10

#: Shared shingle-array expression (0-based Spark array indexing).
_GRAMS = (
    "array_distinct(transform(sequence(0, size(l) - 3), "
    "i -> concat_ws(' ', l[i], l[i+1], l[i+2])))"
)


@register(
    "dedup_containment_ngram",
    oracle=f"""
        WITH arrs AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS l
            FROM documents
        ), idx AS (
            SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
            FROM arrs WHERE len(l) >= 3
        ), grams AS (
            SELECT DISTINCT doc_id,
                   l[i] || ' ' || l[i + 1] || ' ' || l[i + 2] AS g
            FROM idx
        ), sizes AS (
            SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
            FROM grams a JOIN grams b
              ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b,
               round(CAST(i AS DOUBLE) / least(sa.n, sb.n), 4) AS overlap
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(i AS DOUBLE) / least(sa.n, sb.n)
              >= CAST({T_NUM} AS DOUBLE) / CAST({T_DEN} AS DOUBLE)
    """,
    group="dedup_containment",
)
def dedup_containment_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram-shingle overlap-coefficient ≥ 0.9 pairs, prefix-filtered
    against the full inverted index and exactly verified — hash-checked
    against the plain all-pairs oracle (the filter is lossless, so
    candidate-restricted equals all-pairs).
    """
    return containment_pairs(load_table(spark, sf_dir, "documents"))


def containment_pairs(
    d: DataFrame, t_num: int = T_NUM, t_den: int = T_DEN
) -> DataFrame:
    """Overlap-coefficient ≥ t_num/t_den pairs over a (doc_id, text)
    frame — the registered op's kernel, reusable on planted corpora
    (tests) and arbitrary document frames."""
    from desdb_spark.extensions.dedup import ensure_parallelism

    # r11 (the PPJoin playbook, BASELINE.md): the shingle-array frame is
    # built ONCE and checkpointed — the old plan re-evaluated the
    # split+transform+distinct pipeline in every consumer (sizes,
    # df table, prefix ranking, candidate join, and both verify sides:
    # ~6 evaluations). |gs| replaces the explode+count for sizes, the
    # verify threshold is a single-reference integer cross-product, and
    # the candidate stream probes at full width. 15 s → ~4 s at sf0.1.
    arrs = ensure_parallelism(
        d.select(
            "doc_id",
            F.filter(F.split("text", " "), lambda x: x != "").alias("l"),
        )
        .where(F.size("l") >= 3)
        .select("doc_id", F.expr(_GRAMS).alias("gs"))
        .select("doc_id", "gs", F.size("gs").alias("n"))
    ).localCheckpoint()
    grams = arrs.select("doc_id", F.explode("gs").alias("g"))
    sizes = arrs.select("doc_id", "n")
    df_tbl = grams.groupBy("g").agg(F.count("*").alias("df"))
    # k-prefix per doc: the (n − ⌈t·n⌉ + 1) globally-rarest shingles.
    ranked = (
        grams.join(df_tbl, "g")
        .join(sizes, "doc_id")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "g")
            ),
        )
        .where(
            F.col("rk")
            <= F.col("n")
            - F.expr(f"({t_num} * n + {t_den - 1}) div {t_den}")
            + F.lit(1)
        )
        .select(F.col("doc_id").alias("id_p"), "g")
    )
    cand = ensure_parallelism(
        ranked.join(grams.select(F.col("doc_id").alias("id_f"), "g"), "g")
        .where(F.col("id_p") != F.col("id_f"))
        .select(
            F.least("id_p", "id_f").alias("id_a"),
            F.greatest("id_p", "id_f").alias("id_b"),
        )
        .distinct()
    )
    sa = arrs.select(
        F.col("doc_id").alias("id_a"), F.col("gs").alias("ga"), F.col("n").alias("na")
    )
    sb = arrs.select(
        F.col("doc_id").alias("id_b"), F.col("gs").alias("gb"), F.col("n").alias("nb")
    )
    i = F.size(F.array_intersect("ga", "gb"))
    c = i.cast("double") / F.least("na", "nb")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        # c ≥ t_num/t_den ⟺ t_den·i ≥ t_num·min(nₐ,n_b): exact integers,
        # i referenced once, so array_intersect evaluates once per
        # candidate; survivors recompute the rounded double for output.
        .where(t_den * i >= t_num * F.least("na", "nb"))
        .select("id_a", "id_b", F.round(c, 4).alias("overlap"))
    )
