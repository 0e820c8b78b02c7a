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


def test_line_dedup_adversarial_synthetic_corpus(spark, tmp_path):
    """Edges the fixture may not exercise, against the same brute
    force: a document ALL of whose lines are boilerplate (n_kept=0,
    kept_md5 = md5(''), the left-join null/coalesce path), a ragged
    last line shorter than LINE_W, a line repeated twice WITHIN one
    doc only (df counts distinct docs — not dropped), and the
    whole-text fast path equaling the per-line rebuild."""
    import hashlib

    line = " ".join(f"b{i}" for i in range(LINE_W))      # boilerplate line
    uniq = lambda d, j: " ".join(f"u{d}_{j}_{i}" for i in range(LINE_W))  # noqa: E731
    docs = [
        # every line boilerplate -> fully emptied document
        (1, f"{line} {line}"),
        # the other carrier of the boilerplate line + a unique line +
        # a ragged 3-token tail
        (2, f"{line} {uniq(2, 0)} t1 t2 t3"),
        # within-doc-only repeat: same unique line twice in doc 3 only
        (3, f"{uniq(3, 0)} {uniq(3, 0)}"),
        # untouched doc (fast path), ragged tail
        (4, f"{uniq(4, 0)} z9"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, t) for i, t in docs], "doc_id bigint, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")

    rows = docs_dedup_lines_global(spark, sf_dir).collect()
    got = {
        r.doc_id: (r.n_lines, r.n_kept, r.kept_n_chars, r.kept_md5)
        for r in rows
    }
    assert got == _brute(docs)
    empty_md5 = hashlib.md5(b"").hexdigest()
    assert got[1] == (2, 0, 0, empty_md5), "fully-emptied doc path"
    # doc 2 keeps its unique line + ragged tail, loses the boilerplate
    assert got[2][0] == 3 and got[2][1] == 2
    # within-doc repeat is NOT df >= 2 (distinct docs) — nothing dropped
    assert got[3] == (
        2, 2, len(f"{uniq(3, 0)} {uniq(3, 0)}"),
        hashlib.md5(f"{uniq(3, 0)} {uniq(3, 0)}".encode()).hexdigest(),
    )
    assert got[4][1] == got[4][0] == 2
