"""r17 session-2 probe 3: ann_lsh_bucketed — where do the ~6 s actually go?

Probe 2 showed candidate generation is ~0.9 s and verify ~1.4 s; the
remainder must be (a) driver-side plan construction (fn() builds 8x4x64
= 2048 plane-weight literals into Column trees via py4j — the r15 bm25
plan-build finding), (b) the sigs localCheckpoint materialization
(interpreted HOF dot products), or (c) action/collect overhead. Time
each in isolation.

Run:  python3 plans/r17/probes/r17_annlsh_probe3.py
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
        "annlsh-probe3",
        shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4194304",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF_DIR)
    ops = all_operators()
    fn = ops["ann_lsh_bucketed"].fn

    # Warm everything once.
    fn(spark, SF_DIR).toPandas()

    for rep in range(3):
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)      # plan construction + the sigs localCheckpoint
        t1 = time.perf_counter()
        df.toPandas()               # everything downstream of the checkpoint
        t2 = time.perf_counter()
        print(f"rep{rep}: fn()={t1 - t0:.3f} s  execute+collect={t2 - t1:.3f} s  total={t2 - t0:.3f} s")


if __name__ == "__main__":
    main()
