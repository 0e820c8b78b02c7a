"""r17 session-2 probe 2: ann_lsh_bucketed candidate-stage anatomy.

The 4-bit band signature admits only 16 values per band (128 join keys
total), so the self-join's per-key output blocks are quadratic in bucket
size and each block is computed by ONE task — the r12 hot-key situation
prefix_filtered_pairs salts. Quantify: bucket-size distribution, raw
join volume vs distinct pairs, and the stage split (join vs distinct).

Run:  python3 plans/r17/probes/r17_annlsh_probe2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "..")))

from pyspark.sql import functions as F

from desdb_spark.session import get_spark, load_tables, load_table

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


def main():
    spark = get_spark(
        "annlsh-probe2",
        shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4194304",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF_DIR)

    from desdb_spark.extensions.similarity import (
        lsh_signature, quantize_embedding, quantized_planes,
    )
    from desdb_spark.extensions.dedup import ensure_parallelism

    e = ensure_parallelism(load_table(spark, SF_DIR, "embeddings"))
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
    # Bucket-size distribution: per (band, sig) doc counts.
    buckets = sigs.groupBy("band", "sig").count().orderBy(F.desc("count"))
    top = buckets.limit(12).collect()
    print("top buckets (band, sig, n):", [(r["band"], r["sig"], r["count"]) for r in top])
    stats = buckets.agg(
        F.count("*").alias("k"),
        F.sum("count").alias("rows"),
        F.max("count").alias("mx"),
        F.expr("percentile(count, 0.5)").alias("med"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("raw_pairs"),
    ).first()
    print(f"distinct keys={stats['k']} sig rows={stats['rows']} max bucket={stats['mx']} "
          f"median={stats['med']} implied raw pairs={int(stats['raw_pairs'])}")

    a, b = sigs.alias("a"), sigs.alias("b")
    raw = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("vec_a"), F.col("b.id").alias("vec_b"))
    )
    timed(spark, "raw join only (noop)", raw)
    timed(spark, "join + distinct (noop)", raw.distinct())
    # Kernel-style: explicit-width exchange on the pair key, dedup aggregate.
    target = spark.sparkContext.defaultParallelism
    timed(spark, "join + repartition(pair)+dropDuplicates (noop)",
          raw.repartition(target, "vec_a", "vec_b").dropDuplicates(["vec_a", "vec_b"]))

    # Salted variant: split each (band, sig) block S ways — index side
    # replicated, probe side hashed (lossless: every (i<j) pair meets in
    # exactly the bucket where j's hash lands).
    S = 16
    ai = sigs.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1)))).alias("a")
    bp = sigs.withColumn("salt", F.pmod(F.xxhash64("id"), F.lit(S)).cast("int")).alias("b")
    raw_s = (
        ai.repartition(target, "band", "sig", "salt")
        .join(
            bp.repartition(target, "band", "sig", "salt"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.salt") == F.col("b.salt")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("vec_a"), F.col("b.id").alias("vec_b"))
    )
    timed(spark, "salted raw join (noop)", raw_s)
    timed(spark, "salted join + repartition(pair)+dropDuplicates (noop)",
          raw_s.repartition(target, "vec_a", "vec_b").dropDuplicates(["vec_a", "vec_b"]))
    n1 = raw.distinct().count()
    n2 = raw_s.repartition(target, "vec_a", "vec_b").dropDuplicates(["vec_a", "vec_b"]).count()
    print(f"pair parity: distinct={n1} salted={n2} equal={n1 == n2}")


if __name__ == "__main__":
    main()
