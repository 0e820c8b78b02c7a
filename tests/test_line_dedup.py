"""Round-8d: global line-dedup properties — a pure-Python brute force
recomputes the C4 rule end-to-end (split → global df → drop → reassemble
→ md5) at sf0.001 and must agree exactly; plus the identity: a document
none of whose lines repeat is reassembled verbatim."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from desdb_spark.extensions.line_dedup import (
    LINE_W,
    MIN_DROP_DF,
    docs_dedup_lines_global,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def _brute(docs):
    doc_lines = {}
    df = Counter()
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t]
        lines = [
            " ".join(toks[i : i + LINE_W]) for i in range(0, len(toks), LINE_W)
        ]
        doc_lines[doc_id] = lines
        for lt in set(lines):
            df[lt] += 1
    out = {}
    for doc_id, lines in doc_lines.items():
        kept = [lt for lt in lines if df[lt] < MIN_DROP_DF]
        text = " ".join(kept)
        out[doc_id] = (
            len(lines),
            len(kept),
            len(text),
            hashlib.md5(text.encode()).hexdigest(),
        )
    return out


def test_line_dedup_matches_python_brute_force(spark):
    docs = [
        (r.doc_id, r.text)
        for r in load_table(spark, SF_DIR, "documents").collect()
    ]
    expect = _brute(docs)
    rows = docs_dedup_lines_global(spark, SF_DIR).collect()
    got = {
        r.doc_id: (r.n_lines, r.n_kept, r.kept_n_chars, r.kept_md5)
        for r in rows
    }
    assert got == expect
    assert any(r.n_kept < r.n_lines for r in rows), (
        "fixture should contain cross-document repeated lines"
    )


def test_untouched_docs_reassemble_verbatim(spark):
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    rows = docs_dedup_lines_global(spark, SF_DIR).collect()
    verbatim = [r for r in rows if r.n_kept == r.n_lines]
    assert verbatim, "some docs should survive untouched"
    for r in verbatim:
        original = " ".join(t for t in docs[r.doc_id].split(" ") if t)
        assert r.kept_md5 == hashlib.md5(original.encode()).hexdigest()
        assert r.kept_n_chars == len(original)
