"""Containment-dedup semantics (the hash proves cross-engine parity;
this pins losslessness and the asymmetric case Jaccard misses)."""

from __future__ import annotations

from pyspark.sql import functions as F

from desdb_spark.extensions.dedup_containment import containment_pairs
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def _shingles(text: str) -> set[str]:
    ws = [w for w in text.split(" ") if w]
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}


def test_prefix_filter_is_lossless_vs_brute_force(spark):
    """Every all-pairs qualifying pair survives the prefix filter."""
    d = load_table(spark, SF_DIR, "documents")
    got = {
        (r.id_a, r.id_b)
        for r in containment_pairs(d).collect()
    }
    docs = {r.doc_id: _shingles(r.text) for r in d.select("doc_id", "text").collect()}
    docs = {k: v for k, v in docs.items() if v}
    ids = sorted(docs)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(docs[a] & docs[b])
            if inter >= 0.9 * min(len(docs[a]), len(docs[b])):
                want.add((a, b))
    assert got == want


def test_finds_planted_quote_that_jaccard_misses(spark):
    """A 10-shingle doc verbatim inside a 100x larger doc: overlap = 1.0
    but Jaccard ~ 0.1 — the containment op reports it at t=0.9 where a
    Jaccard-0.9 op cannot."""
    short = " ".join(f"q{i}" for i in range(12))
    long = short + " " + " ".join(f"f{i}" for i in range(120))
    d = spark.createDataFrame(
        [(1, short), (2, long), (3, "x0 x1 x2 x3 x4 x5")],
        "doc_id long, text string",
    )
    rows = containment_pairs(d).collect()
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 2)}
    (r,) = rows
    assert r.overlap == 1.0
    sa, sb = _shingles(short), _shingles(long)
    jaccard = len(sa & sb) / len(sa | sb)
    assert jaccard < 0.2  # the symmetric measure genuinely misses it


def test_threshold_is_inclusive(spark):
    """A pair at exactly t qualifies: smaller set of 10 shingles with 9
    shared — overlap 0.9."""
    # 12 tokens -> 10 shingles; change the last token -> 9 shared.
    base = [f"w{i}" for i in range(12)]
    other = base[:-1] + ["zz"] + [f"p{i}" for i in range(40)]
    d = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(other))], "doc_id long, text string"
    )
    rows = containment_pairs(d).collect()
    assert {(r.id_a, r.id_b, r.overlap) for r in rows} == {(1, 2, 0.9)}
