"""Round-8e: k-anonymity audit over the document corpus — the
re-identification risk report (Sweeney's k-anonymity, public
literature; the standard pre-release privacy gate alongside
docs_pii_scrub_stats' content scrub).

Quasi-identifiers here are the release-visible metadata attributes —
(lang, source, length bucket) — the combination an adversary can join
against an external dataset. Every document whose QI equivalence class
is small is linkable: the audit reports the class-size histogram in
standard k bands and the share of the corpus at each risk level. The
actionable output of a real release run is identical: generalize
(widen the length bucket) or suppress until the sub-k bands are empty.

Exact integers throughout (counts and floor-micro shares).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Length-bucket width in characters — the generalization knob: widen
#: it and classes merge, k rises, utility drops.
LEN_BUCKET = 100

#: Class-size bands: (lower bound, label). 1 = unique = fully linkable;
#: the k=5 release gate is the classic threshold (bands below it are
#: the at-risk mass).
BANDS = ((1, "1"), (2, "2-4"), (5, "5-9"), (10, "10-49"), (50, "50+"))

_BAND_SQL = """CASE WHEN c = 1 THEN 1
                    WHEN c <= 4 THEN 2
                    WHEN c <= 9 THEN 5
                    WHEN c <= 49 THEN 10
                    ELSE 50 END"""


@register(
    "docs_k_anonymity_audit",
    oracle=f"""
        WITH classes AS (
            SELECT lang, source, n_chars // {LEN_BUCKET} AS len_bucket,
                   CAST(count(*) AS BIGINT) AS c
            FROM documents
            GROUP BY 1, 2, 3
        ), banded AS (
            SELECT {_BAND_SQL} AS band_lo,
                   CAST(count(*) AS BIGINT) AS n_classes,
                   CAST(sum(c) AS BIGINT) AS n_docs
            FROM classes GROUP BY 1
        )
        SELECT CAST(band_lo AS INTEGER) AS band_lo,
               CASE band_lo WHEN 1 THEN '1' WHEN 2 THEN '2-4'
                    WHEN 5 THEN '5-9' WHEN 10 THEN '10-49'
                    ELSE '50+' END AS band,
               n_classes, n_docs,
               CAST(n_docs * 1000000 //
                    sum(n_docs) OVER () AS BIGINT) AS docs_share_micros
        FROM banded
        ORDER BY band_lo
    """,
    group="privacy_ext",
)
def docs_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-size histogram of the (lang, source, n_chars//{LEN_BUCKET})
    quasi-identifier partition: per k band, how many equivalence
    classes, how many documents, and each band's corpus share in exact
    floor micros. Band "1" is the uniquely-linkable mass; everything
    below the 5 band fails a k=5 release gate.

    Scale shape: one groupBy on the QI tuple (the only corpus-sized
    shuffle, map-side combined), then the banding and the histogram run
    on the CLASS table — already thousands of times smaller — and the
    share window spans the ≤{len(BANDS)}-row band table, where a global
    window costs nothing. This is the one-pass shape a 100 TB privacy
    audit needs: risk is a property of class sizes, never of pairs.
    """
    d = load_table(spark, sf_dir, "documents")
    classes = (
        d.groupBy(
            "lang",
            "source",
            (F.col("n_chars") / LEN_BUCKET)
            .cast("bigint")
            .alias("len_bucket"),
        )
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    banded = (
        classes.select(F.expr(_BAND_SQL).alias("band_lo"), "c")
        .groupBy("band_lo")
        .agg(
            F.count("*").cast("bigint").alias("n_classes"),
            F.sum("c").cast("bigint").alias("n_docs"),
        )
    )
    label = F.when(F.col("band_lo") == 1, "1")
    for lo, name in BANDS[1:]:
        label = label.when(F.col("band_lo") == lo, name)
    share = F.floor(
        F.col("n_docs")
        * 1000000
        / F.sum("n_docs").over(Window.partitionBy())
    )
    return banded.select(
        F.col("band_lo").cast("int").alias("band_lo"),
        label.alias("band"),
        "n_classes",
        "n_docs",
        share.cast("bigint").alias("docs_share_micros"),
    ).orderBy("band_lo")
