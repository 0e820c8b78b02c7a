"""Bench harness (SURVEY.md §7.1 M7): headline queries at $SPARK_GRAFT_SF_DIR.

Measures warm-session per-query wall time (one shared SparkSession, JVM
warmed by a throwaway action) per BASELINE.md's guidance: DuckDB's baseline
times are 10-200 ms, so Spark's seconds of first-action overhead must be
amortized, not billed to the first query.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from desdb_spark.registry import all_operators
from desdb_spark.session import get_spark, load_tables

#: Headline queries — the BASELINE.md measured set.
HEADLINE = [
    "agg_hash_groupby_q1",
    "join_multiway_star",
    "join_sort_merge_large",
    "join_anti",
    "window_frame_rows",
    "topk_limit",
    "agg_rollup",
    "scalar_json_events",
    "stream_session_window",
    "knn_cosine_topk",
    "dedup_exact_docs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    # Fixture shuffles at sf0.1 are ~600k rows; 4 partitions keeps task
    # scheduling overhead below the work per task (BASELINE.md guidance).
    # 4 MB split size parallelizes the ~10 MB fixture scans across cores
    # (the 128 MB default is right for real file sizes, wrong for sf0.1).
    spark = get_spark(
        "bench",
        shuffle_partitions=4,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4194304"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    ops = all_operators()

    # Warm the JVM + parquet footers with a throwaway action.
    for name in HEADLINE:
        ops[name].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            # Arrow-batched materialization — same full-result semantics as
            # collect(), minus py4j row-by-row deserialization overhead
            # (DuckDB's .df() baseline materializes the same way).
            ops[name].fn(spark, sf_dir).toPandas()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 4)  # median of 3

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_suite_warm_median_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
