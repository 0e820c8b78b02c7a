"""r17 session-2 probe: the five mapInPandas ops hard-code
``repartition(8, key)`` ahead of their Python kernels — a constant that
serializes a 100 TB decode to 8 tasks AND uses 8 of 32 local cores. A/B
each cell at width 8 vs defaultParallelism before changing the source
(the fixture cells are 1-2 s, so per-worker startup may mask the win
locally; the change is about the scale shape, but it must not REGRESS
the measured cells).

Run:  python3 plans/r17/probes/r17_mmwidth_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "..")))

from desdb_spark.session import get_spark, load_tables
from desdb_spark.registry import all_operators

SF_DIR = "/root/testdata/sf0.1"
OPS = [
    "emb_truncation_recall_curve",
    "multimodal_frame_sample",
    "multimodal_resample_pixels",
    "multimodal_resize_batch",
    "multimodal_decode_features",
]


def main():
    import desdb_spark.extensions.matryoshka_ext as mx
    import desdb_spark.extensions.multimodal_ext as mm
    import desdb_spark.extensions.multimodal_decode as md

    spark = get_spark(
        "mmwidth-probe",
        shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4194304",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF_DIR)
    ops = all_operators()

    # Baseline as-registered (width 8 in source at probe time).
    for name in OPS:
        fn = ops[name].fn
        fn(spark, SF_DIR).toPandas()  # warm
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).toPandas()
            runs.append(time.perf_counter() - t0)
        print(f"{name} [as-registered]: {' '.join(f'{r:.3f}' for r in sorted(runs))} s")


if __name__ == "__main__":
    main()
