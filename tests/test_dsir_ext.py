"""Round-8d: DSIR importance-weight properties — a pure-Python brute
force recomputes the hashed-bigram models and per-doc scores at
sf0.001 and must agree to the rounded output; plus the semantic claim:
scores separate the target language from the rest."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from desdb_spark.extensions.dsir_ext import (
    N_BUCKETS,
    TARGET_LANG,
    docs_dsir_importance_weights,
)
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def _bucket(bigram: str) -> str:
    return hashlib.md5(bigram.encode()).hexdigest()[:2]


def _brute(docs):
    c_r, c_t = Counter(), Counter()
    doc_buckets = {}
    for doc_id, lang, text in docs:
        toks = [t for t in text.split(" ") if t]
        buckets = [
            _bucket(f"{toks[i]} {toks[i + 1]}")
            for i in range(len(toks) - 1)
        ]
        if not buckets:
            continue
        doc_buckets[doc_id] = (lang, buckets)
        for b in buckets:
            c_r[b] += 1
            if lang == TARGET_LANG:
                c_t[b] += 1
    R, T = sum(c_r.values()), sum(c_t.values())
    lp = {
        b: math.log(
            (c_t[b] + 1) * (R + N_BUCKETS) / ((c_r[b] + 1) * (T + N_BUCKETS))
        )
        for b in c_r
    }
    # Integer micro-unit discipline (r10 contract change, see
    # dsir_ext.py docstring): each bucket's log-ratio rounds to integer
    # MICRO-units (half away from zero) once; per-doc totals are exact
    # integer sums; `selected` compares the exact SUM to zero; the
    # published 4-dp mean is half-away-from-zero integer rounding of
    # the micro sum. r9's round(mean,4)>0 definition flipped boundary
    # docs between engine configs — retired.
    def _half_away(x: float) -> int:
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    lp_micros = {b: _half_away(v * 1_000_000) for b, v in lp.items()}
    out = {}
    for doc_id, (lang, buckets) in doc_buckets.items():
        n = len(buckets)
        s = sum(lp_micros[b] for b in buckets)
        mag = abs(s)
        r4 = (2 * mag + 100 * n) // (200 * n)
        if s < 0:
            r4 = -r4
        out[doc_id] = (lang, n, r4 / 10_000.0, 1 if s > 0 else 0)
    return out


def test_dsir_matches_python_brute_force(spark):
    docs = [
        (r.doc_id, r.lang, r.text)
        for r in load_table(spark, SF_DIR, "documents").collect()
    ]
    expect = _brute(docs)
    got = {
        r.doc_id: (r.lang, r.n_bigrams, r.dsir_logratio, r.selected)
        for r in docs_dsir_importance_weights(spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for doc_id, (lang, n, score, sel) in expect.items():
        g = got[doc_id]
        assert g[0] == lang and g[1] == n and g[3] == sel
        # engine-order float sums may differ in the last ulp; the 4-dp
        # rounding absorbs it except exactly AT a boundary (none in the
        # fixture; hash parity with DuckDB is the cross-engine proof)
        assert abs(g[2] - score) < 1.1e-4


def test_dsir_separates_target_language(spark):
    rows = docs_dsir_importance_weights(spark, SF_DIR).collect()
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang].append(r.dsir_logratio)
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    target_mean = mean(by_lang[TARGET_LANG])
    for lang, scores in by_lang.items():
        if lang != TARGET_LANG:
            assert target_mean > mean(scores)
    selected = [r for r in rows if r.selected]
    assert selected
    target_share_selected = mean(
        [1.0 if r.lang == TARGET_LANG else 0.0 for r in selected]
    )
    target_share_all = mean(
        [1.0 if r.lang == TARGET_LANG else 0.0 for r in rows]
    )
    assert target_share_selected > target_share_all
