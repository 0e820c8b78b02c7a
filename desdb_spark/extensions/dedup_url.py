"""Round-8: URL/domain-grain dedup — the CommonCrawl-style FIRST pass of
web-corpus curation (VERDICT r7 item 4). Before any content hashing, a
crawl dedups on the canonicalized URL: the same page arrives under
http/https, with/without ``www.``, with per-visit query strings and
fragments — all one document. Canonical-URL dedup removes those for the
cost of a string normalization + one groupBy, shrinking the corpus that
the (much more expensive) content tiers (extensions/dedup.py) ever see.

The fixture has no url column, so the op derives one DETERMINISTICALLY
from (doc_id, source) — with planted same-page variants: scheme flips by
doc_id parity, a ``www.`` prefix appears for one residue class, host
case varies, and every URL carries a unique query string + fragment.
Docs sharing (source, doc_id % PAGES_PER_SITE) are the same logical page
and must collapse; everything that varies is exactly what
canonicalization strips. Both engines synthesize and canonicalize the
same URLs, so the result is hash-checked end to end.

Scale shape: canonicalization is per-row JVM string work (zero Python);
the dedup is ONE shuffle on the canonical key carrying (canon_url,
doc_id, n_chars) only — never the payload; survivor selection rides the
same exchange (count + row_number windows over one partitioning). At
100 TB this is the cheapest dedup tier by an order of magnitude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Distinct logical pages per source site — doc_id % PAGES_PER_SITE is
#: the page number, so ~N/PAGES_PER_SITE docs per source collapse into
#: each canonical URL.
PAGES_PER_SITE = 40

_URL_SQL = f"""
    CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END
    || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END
    || '.example.org/page/' || CAST(doc_id % {PAGES_PER_SITE} AS VARCHAR)
    || '?session=' || CAST(doc_id AS VARCHAR)
    || '#frag' || CAST(doc_id % 7 AS VARCHAR)
"""


@register(
    "dedup_url_canonical",
    oracle=f"""
        WITH urls AS (
            SELECT doc_id, n_chars, {_URL_SQL} AS url
            FROM documents
        ), canon AS (
            SELECT doc_id, n_chars, url,
                   regexp_replace(
                       lower(split_part(
                           regexp_replace(
                               regexp_replace(url, '^[A-Za-z]+://', ''),
                               '[?#].*$', ''),
                           '/', 1)),
                       '^www\\.', '')
                   || substring(
                          regexp_replace(
                              regexp_replace(url, '^[A-Za-z]+://', ''),
                              '[?#].*$', ''),
                          len(split_part(
                              regexp_replace(
                                  regexp_replace(url, '^[A-Za-z]+://', ''),
                                  '[?#].*$', ''),
                              '/', 1)) + 1)
                   AS canon_url
            FROM urls
        )
        SELECT canon_url,
               CAST(n_copies AS BIGINT) AS n_copies,
               CAST(keep_doc_id AS BIGINT) AS keep_doc_id,
               CAST(keep_chars AS BIGINT) AS keep_chars
        FROM (
            SELECT canon_url,
                   count(*) OVER (PARTITION BY canon_url) AS n_copies,
                   row_number() OVER (
                       PARTITION BY canon_url
                       ORDER BY n_chars DESC, doc_id) AS rk,
                   doc_id AS keep_doc_id, n_chars AS keep_chars
            FROM canon)
        WHERE rk = 1
    """,
    group="dedup_url",
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup with keep-best survivor selection: derive each
    document's URL, canonicalize it (strip scheme / query / fragment /
    leading ``www.``; lowercase the host, preserve path case), and keep
    the highest-quality copy (longest text, then lowest doc_id) per
    canonical URL, annotated with the duplicate-group size.

    The canonicalizer operates on the URL STRING (regex + split), not on
    the synthesis parts — the op's value is the normalization itself, so
    a canonicalization bug breaks the hash even though the fixture URLs
    are synthesized.
    """
    d = load_table(spark, sf_dir, "documents")
    url = (
        F.when(F.col("doc_id") % 2 == 0, F.lit("https://")).otherwise("http://")
    )
    url = F.concat(
        url,
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(""),
        F.when(F.col("doc_id") % 5 == 0, F.upper("source")).otherwise(
            F.col("source")
        ),
        F.lit(".example.org/page/"),
        (F.col("doc_id") % PAGES_PER_SITE).cast("string"),
        F.lit("?session="),
        F.col("doc_id").cast("string"),
        F.lit("#frag"),
        (F.col("doc_id") % 7).cast("string"),
    )
    with_url = d.select("doc_id", "n_chars", url.alias("url"))
    # strip scheme, then query/fragment
    bare = F.regexp_replace(
        F.regexp_replace("url", r"^[A-Za-z]+://", ""), r"[?#].*$", ""
    )
    host = F.substring_index(bare, "/", 1)
    canon = F.concat(
        F.regexp_replace(F.lower(host), r"^www\.", ""),
        F.substring(bare, F.length(host) + 1, F.length(bare)),
    )
    canoned = with_url.select(
        "doc_id", "n_chars", canon.alias("canon_url")
    )
    w = Window.partitionBy("canon_url")
    rk = Window.partitionBy("canon_url").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        canoned.withColumn("n_copies", F.count("*").over(w).cast("bigint"))
        .withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") == 1)
        .select(
            "canon_url",
            "n_copies",
            F.col("doc_id").cast("bigint").alias("keep_doc_id"),
            F.col("n_chars").cast("bigint").alias("keep_chars"),
        )
    )
