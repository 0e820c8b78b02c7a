"""Round-8d: span-removal rewrite properties — consistency with the
span operator (removed-token count per doc equals the union of its span
extents) and the clean-document identity (zero spans → verbatim md5)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from desdb_spark.extensions.span_dedup import dedup_exact_substring_spans
from desdb_spark.extensions.span_rewrite import docs_strip_repeated_spans
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_removed_equals_span_union(spark):
    spans = defaultdict(int)
    for r in dedup_exact_substring_spans(spark, SF_DIR).collect():
        spans[r.doc_id] += r.span_tokens  # spans are disjoint (pinned
        # in test_span_dedup), so their union size is the sum
    rows = docs_strip_repeated_spans(spark, SF_DIR).collect()
    for r in rows:
        assert r.n_removed == spans.get(r.doc_id, 0)
    assert any(r.n_removed for r in rows)


def test_untouched_docs_digest_verbatim(spark):
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    rows = docs_strip_repeated_spans(spark, SF_DIR).collect()
    verbatim = [r for r in rows if r.n_removed == 0]
    assert verbatim
    for r in verbatim:
        original = " ".join(t for t in docs[r.doc_id].split(" ") if t)
        assert r.kept_md5 == hashlib.md5(original.encode()).hexdigest()
