"""r17 session-2: cost of the gated broadcast's sum(n) action on the
retention-curve cell (bench protocol: llm confs, fresh plan per run).

Run:  python3 plans/r17/probes/r17_curve_gate_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "..")))

from desdb_spark.session import get_spark, load_tables
from desdb_spark.registry import all_operators

SF_DIR = "/root/testdata/sf0.1"


def main():
    spark = get_spark(
        "curve-gate-probe",
        shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4194304",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF_DIR)
    fn = all_operators()["dedup_jaccard_retention_curve"].fn
    fn(spark, SF_DIR).toPandas()  # warm
    runs = []
    for _ in range(4):
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        t0 = time.perf_counter()
        fn(spark, SF_DIR).toPandas()
        runs.append(time.perf_counter() - t0)
    print("cell:", " ".join(f"{r:.3f}" for r in sorted(runs)), "s")


if __name__ == "__main__":
    main()
