"""Canonicalization parity for the differential gate (VERDICT r1 #3).

tools/selfcheck.py's canonicalize() is the local replica of the driver's
compare. Its risk is a silent divergence between the two pandas arrival
paths — Spark ``toPandas()`` (Arrow, datetime64[ns], None-for-null objects)
vs DuckDB ``.df()`` (datetime64[us], NaN-for-null) — on tricky cell types.
This test routes semantically-identical rows through BOTH engines and
byte-compares the canonical (rows, typed-cols, hash) triple.
"""

from __future__ import annotations

import duckdb

from tools.selfcheck import canonicalize, driver_shape_gate


def test_canonicalize_parity_tricky_types(spark):
    spark_sql = """
        SELECT * FROM VALUES
          (CAST(1 AS BIGINT), CAST(2.0 AS DOUBLE), CAST(2.5 AS DOUBLE),
           TIMESTAMP '2024-03-01 12:34:56.789', DATE '2024-03-01',
           'text', true, array(1.5D, 2.0D),
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS STRING),
           CAST(NULL AS TIMESTAMP)),
          (CAST(-7 AS BIGINT), CAST(-0.0 AS DOUBLE), CAST(0.1 AS DOUBLE),
           TIMESTAMP '1999-12-31 23:59:59', DATE '1999-12-31',
           '', false, array(CAST(NULL AS DOUBLE), 3.0D),
           CAST(0 AS BIGINT), CAST(1e15 AS DOUBLE), 'x',
           TIMESTAMP '2024-03-01 00:00:00')
        AS t(i, f_int, f_frac, ts, d, s, b, arr, ni, nf, ns, nts)
    """
    duck_sql = """
        SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), CAST(2.0 AS DOUBLE), CAST(2.5 AS DOUBLE),
           TIMESTAMP '2024-03-01 12:34:56.789', DATE '2024-03-01',
           'text', true, [CAST(1.5 AS DOUBLE), 2.0],
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
           CAST(NULL AS TIMESTAMP)),
          (CAST(-7 AS BIGINT), CAST(-0.0 AS DOUBLE), CAST(0.1 AS DOUBLE),
           TIMESTAMP '1999-12-31 23:59:59', DATE '1999-12-31',
           '', false, [CAST(NULL AS DOUBLE), 3.0],
           CAST(0 AS BIGINT), CAST(1e15 AS DOUBLE), 'x',
           TIMESTAMP '2024-03-01 00:00:00'))
        AS t(i, f_int, f_frac, ts, d, s, b, arr, ni, nf, ns, nts)
    """
    sdf = spark.sql(spark_sql).toPandas()
    odf = duckdb.connect().execute(duck_sql).df()
    sn, sc, sh = canonicalize(sdf)
    on, oc, oh = canonicalize(odf)
    assert sn == on == 2
    assert sc == oc, (sc, oc)
    assert sh == oh


def test_driver_shape_gate_reproduces_r6_array_crash():
    """The external driver canonicalizes with pandas ``sort_values``,
    which raises on unhashable array cells — the r6 driver ERR on
    agg_collect_sorted_list. driver_shape_gate must reproduce exactly
    that failure locally (multi-column frame with an ArrayType-shaped
    object column) and pass scalar frames untouched."""
    import pandas as pd
    import pytest

    bad = pd.DataFrame(
        {"k": ["a", "b", "a"], "segments": [[1, 2], [3], [1, 2]], "n": [2, 1, 2]}
    )
    with pytest.raises(TypeError):
        driver_shape_gate(bad)

    good = pd.DataFrame({"k": ["a", "b"], "segments": ["1|2", "3"], "n": [2, 1]})
    driver_shape_gate(good)  # must not raise
    empty = pd.DataFrame({"k": [], "v": []})
    driver_shape_gate(empty)  # must not raise
