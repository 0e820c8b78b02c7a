"""Round-8e: quality-signal correlation — numpy corrcoef parity at
sf0.001 (independent recomputation from the per-doc grains) plus the
sufficient-statistic identities."""

from __future__ import annotations

import numpy as np

from desdb_spark.extensions.lm_score import scored_bigrams
from desdb_spark.extensions.signal_corr import quality_signal_correlation
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_correlation_matches_numpy(spark):
    lp = {}
    for r in (
        scored_bigrams(spark, SF_DIR)
        .groupBy("doc_id")
        .avg("lp")
        .collect()
    ):
        lp[r.doc_id] = round(round(r["avg(lp)"], 4) * 10000)
    words = {
        r.doc_id: len([t for t in r.text.split(" ") if t])
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    xs = np.array([lp[d] for d in sorted(lp)], dtype=np.int64)
    ys = np.array([words[d] for d in sorted(lp)], dtype=np.int64)
    row = quality_signal_correlation(spark, SF_DIR).collect()[0]
    assert row.n_docs == len(xs)
    assert row.sum_lp_tm == int(xs.sum())
    assert row.sum_words == int(ys.sum())
    assert row.sum_lp_sq == int((xs * xs).sum())
    assert row.sum_words_sq == int((ys * ys).sum())
    assert row.sum_cross == int((xs * ys).sum())
    r_np = np.corrcoef(xs.astype(np.float64), ys.astype(np.float64))[0, 1]
    assert abs(row.pearson_r - r_np) < 1e-5
    assert -1.0 <= row.pearson_r <= 1.0
