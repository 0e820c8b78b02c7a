"""Round-8 dedup tiers: planted-recall and canonicalization semantics
for the semantic-embedding and canonical-URL dedup ops (the differential
hash proves cross-engine parity; these pin the *properties* the hash
alone wouldn't make obvious)."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.extensions.dedup_semantic import (
    SEM_THRESHOLD,
    TWIN_OFFSET,
    TWIN_STRIDE,
    dedup_semantic_embedding,
)
from desdb_spark.extensions.dedup_url import dedup_url_canonical
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_semantic_dedup_planted_recall(spark):
    """Every planted twin is flagged as a duplicate of exactly its
    original (100% recall on the planted set — twins share prefix signs,
    so cell blocking cannot split them), at cosine ≥ the threshold, and
    nothing else is flagged (organic within-cell cosines top out ~0.49)."""
    rows = dedup_semantic_embedding(spark, SF_DIR).collect()
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    planted = {
        vid + TWIN_OFFSET: vid for vid in range(0, n_vecs, TWIN_STRIDE)
    }
    got = {r.vec_id: (r.keep_id, r.cos_sim) for r in rows}
    assert set(got) == set(planted)  # all twins found, no false positives
    for twin, (keep, cos) in got.items():
        assert keep == planted[twin]
        assert cos >= SEM_THRESHOLD


def test_url_dedup_collapses_planted_variants(spark):
    """Docs sharing (source, page number) collapse into one canonical URL
    regardless of scheme / www. / host case / query / fragment; the
    survivor is the longest copy (then lowest doc_id)."""
    from desdb_spark.extensions.dedup_url import PAGES_PER_SITE

    d = load_table(spark, SF_DIR, "documents")
    truth = {
        (r.source.lower(), r.doc_id % PAGES_PER_SITE): r.cnt
        for r in d.groupBy(
            F.lower("source").alias("source"),
            (F.col("doc_id") % PAGES_PER_SITE).alias("page"),
        )
        .agg(F.count("*").alias("cnt"), F.min("doc_id").alias("doc_id"))
        .withColumnRenamed("page", "pg")
        .selectExpr("source", "doc_id", "cnt")
        .collect()
    }
    rows = dedup_url_canonical(spark, SF_DIR).collect()
    assert len(rows) == len(truth)
    for r in rows:
        # canonical form: host lowered, no scheme/query/fragment/www
        assert "://" not in r.canon_url and "?" not in r.canon_url
        assert "#" not in r.canon_url and not r.canon_url.startswith("www.")
        host, _, path = r.canon_url.partition("/")
        assert host == host.lower()
        src = host.split(".example.org")[0]
        page = int(path.rsplit("/", 1)[-1])
        assert truth[(src, page)] == r.n_copies
    # survivor quality: keep_chars is the group max
    best = {
        (r.src, r.pg): r.mx
        for r in d.groupBy(
            F.lower("source").alias("src"),
            (F.col("doc_id") % PAGES_PER_SITE).alias("pg"),
        )
        .agg(F.max("n_chars").alias("mx"))
        .collect()
    }
    for r in rows:
        host, _, path = r.canon_url.partition("/")
        src = host.split(".example.org")[0]
        page = int(path.rsplit("/", 1)[-1])
        assert r.keep_chars == best[(src, page)]


def test_minhash_eval_invariants(spark):
    """The audit's numbers must be internally consistent (verified ⊆
    truth because both sides Jaccard-verify at the same threshold) and
    recall must clear the planted floor — the fixture's dup pairs are
    exact duplicates, which collide in every MinHash band, so the LSH
    tier cannot miss them."""
    from desdb_spark.extensions.dedup_eval import dedup_minhash_eval

    (r,) = dedup_minhash_eval(spark, SF_DIR).collect()
    assert r.n_lsh_verified <= r.n_truth
    assert r.n_missed == r.n_truth - r.n_lsh_verified
    assert r.n_lsh_candidates >= r.n_lsh_verified
    assert r.recall_micros == (1_000_000 * r.n_lsh_verified) // max(r.n_truth, 1)
    assert r.n_truth > 0  # fixture plants dups; an empty truth is a bug
    assert r.recall_micros >= 900_000
