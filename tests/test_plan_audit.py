"""Fleet-wide physical-plan audit: no operator may silently plan a cross
product or broadcast-nested-loop join — the two shapes that are fatal at
100 TB. Ops whose *semantics* are exact pairwise comparison are exempt,
with their scale path named.
"""

from __future__ import annotations

import pytest

from desdb_spark.registry import all_operators
from tests.conftest import SF_DIR

#: r3: formerly exempt knn_cosine_topk / dedup_embedding_cosine now plan
#: mapInPandas GEMM kernels (no join at all) and must pass like everyone
#: else (VERDICT r2 item 3).
EXEMPT: set[str] = set()

#: Ops that launch real streaming jobs inside the builder (plan not
#: inspectable the same way) — their semantics are covered elsewhere.
SKIP = {
    "stream_late_data_watermark",
    "stream_stateful_profile",
    "ann_ivf_kmeans",
    "stream_stream_enrich_join",
}


@pytest.mark.parametrize("name", sorted(all_operators()))
def test_no_accidental_cross_products(spark, name):
    op = all_operators()[name]
    if name in SKIP:
        pytest.skip("streaming/ml job runs eagerly; audited by its own test")
    df = op.fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name in EXEMPT:
        pytest.skip("exact pairwise tier by design; scale path is LSH/IVF")
    assert "CartesianProduct" not in plan, f"{name} plans a cross product"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name} plans a BNLJ"
