"""r17 session-2 probe: ann_lsh_bucketed — quantify the candidate volume,
the survivor fraction, and whether the semantic `where(cos_sim >= 0.45)`
filter's PushDownPredicate duplication of the 64-dim dot expression is a
material cost (the retention-curve r17 finding was a REDUNDANT filter;
here the filter is the query's semantics, so the only lossless fix would
be a materialization barrier — worth it only if survivors are a large
fraction of candidates AND the duplicated dot dominates the cell).

Run:  python3 plans/r17/probes/r17_annlsh_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "..")))

from pyspark.sql import functions as F

from desdb_spark.session import get_spark, load_tables, load_table
from desdb_spark.registry import all_operators

SF_DIR = "/root/testdata/sf0.1"


def timed(spark, label, df, reps=3):
    runs = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"{label}: {' '.join(f'{r:.3f}' for r in sorted(runs))} s")
    return sorted(runs)[len(runs) // 2]


def main():
    spark = get_spark(
        "annlsh-probe",
        shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4194304",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF_DIR)
    ops = all_operators()

    # Volumes: candidates vs survivors.
    from desdb_spark.extensions.similarity import (
        dot, l2_norm, lsh_signature, quantize_embedding, quantized_planes,
    )
    from desdb_spark.extensions.dedup import ensure_parallelism

    e = ensure_parallelism(load_table(spark, SF_DIR, "embeddings"))
    n_vec = e.count()
    dim, bands, bits = 64, 8, 4
    planes = quantized_planes(dim, bands * bits)
    emb = F.col("embedding").cast("array<double>")
    sigs = (
        e.select(F.col("vec_id").alias("id"), quantize_embedding(emb).alias("eq"))
        .select(
            "id",
            F.posexplode(
                F.array(*[
                    lsh_signature(F.col("eq"), planes[b * bits:(b + 1) * bits], quantized=True)
                    for b in range(bands)
                ])
            ).alias("band", "sig"),
        )
        .localCheckpoint()
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("vec_a"), F.col("b.id").alias("vec_b"))
        .distinct()
        .localCheckpoint()
    )
    n_cand = cand.count()
    vecs = e.select(F.col("vec_id").alias("id"), emb.alias("emb"), l2_norm(emb).alias("nrm"))
    ea, eb = vecs.alias("ea"), vecs.alias("eb")
    scored = (
        cand.join(ea, F.col("vec_a") == F.col("ea.id"))
        .join(eb, F.col("vec_b") == F.col("eb.id"))
        .select(
            "vec_a", "vec_b",
            F.round(dot(F.col("ea.emb"), F.col("eb.emb")) / (F.col("ea.nrm") * F.col("eb.nrm")), 6).alias("cos_sim"),
        )
    )
    n_surv = scored.where(F.col("cos_sim") >= 0.45).count()
    print(f"vectors={n_vec} candidates={n_cand} survivors={n_surv} "
          f"survivor_frac={n_surv / max(n_cand, 1):.3f} "
          f"cand_frac_of_allpairs={2 * n_cand / max(n_vec * (n_vec - 1), 1):.3f}")

    # Cell as registered (fresh plan per run, bench protocol).
    def cell():
        return ops["ann_lsh_bucketed"].fn(spark, SF_DIR)
    cell().toPandas()  # warm
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        cell().toPandas()
        runs.append(time.perf_counter() - t0)
    print(f"cell as-registered: {' '.join(f'{r:.3f}' for r in sorted(runs))} s")

    # Phase attribution over the checkpointed candidate set (isolates the
    # verify+filter+sort tail from candidate generation):
    timed(spark, "verify+filter (noop, dup eval as planned)",
          scored.where(F.col("cos_sim") >= 0.45))
    # Barrier variant: same scored plan, filter applied after a shuffle
    # boundary... a repartition does NOT stop PushDownPredicate, so the
    # honest barrier comparison is scored-without-filter vs with-filter:
    timed(spark, "scored only, no filter (noop)", scored)


if __name__ == "__main__":
    main()
