"""r17 probe: dedup_minhash_eval phase attribution (warm session)."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from desdb_spark.extensions.dedup import (
    minhash_candidate_pairs, ngram_jaccard, prefix_filtered_pairs, shingles,
)
from desdb_spark.extensions.dedup_eval import THRESHOLD_DEN, THRESHOLD_NUM
from desdb_spark.session import get_spark, load_table

SF = "/root/testdata/sf0.1"


def main():
    spark = get_spark(
        "r17-mheval-probe", shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4194304",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    d = load_table(spark, SF, "documents")
    t = float(THRESHOLD_NUM) / THRESHOLD_DEN

    def once(tag):
        ph = {}
        t0 = time.perf_counter()
        exact_cand = prefix_filtered_pairs(
            d, t_num=THRESHOLD_NUM, t_den=THRESHOLD_DEN, ngram=3
        ).localCheckpoint()
        ph["exact_cand_ckpt"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        lsh_cand = minhash_candidate_pairs(d).localCheckpoint()
        ph["lsh_cand_ckpt"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        all_ids = (
            exact_cand.select(F.col("id_a").alias("doc_id"))
            .unionByName(exact_cand.select(F.col("id_b").alias("doc_id")))
            .unionByName(lsh_cand.select(F.col("id_a").alias("doc_id")))
            .unionByName(lsh_cand.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        sets_df = (
            d.join(all_ids, "doc_id", "left_semi")
            .select(
                F.col("doc_id").alias("id"),
                F.array_distinct(shingles(F.col("text"), 3)).alias("sh"),
            )
            .localCheckpoint()
        )
        ph["sets_ckpt"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        truth = (
            ngram_jaccard(d, exact_cand, sets_df=sets_df)
            .where(F.col("jaccard") >= t).select("id_a", "id_b")
        )
        verified = (
            ngram_jaccard(d, lsh_cand.select("id_a", "id_b"), sets_df=sets_df)
            .where(F.col("jaccard") >= t).select("id_a", "id_b")
        )
        tagged = (
            truth.withColumn("in_truth", F.lit(1))
            .join(verified.withColumn("in_v", F.lit(1)), ["id_a", "id_b"], "full_outer")
            .select(
                F.coalesce("in_truth", F.lit(0)).alias("in_truth"),
                F.coalesce("in_v", F.lit(0)).alias("in_v"),
                F.lit(0).alias("in_cand"),
            )
        )
        u = tagged.unionByName(
            lsh_cand.select(
                F.lit(0).alias("in_truth"), F.lit(0).alias("in_v"),
                F.lit(1).alias("in_cand"),
            )
        )
        row = u.agg(
            F.sum("in_truth").alias("nt"), F.sum("in_v").alias("nv"),
            F.sum(((F.col("in_truth") == 1) & (F.col("in_v") == 0)).cast("long")).alias("nm"),
            F.sum("in_cand").alias("nc"),
        ).first()
        ph["verify_agg_action"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        spark.createDataFrame(
            [(int(row.nt), int(row.nc), int(row.nv), int(row.nm), 1, 1)],
            "n_truth bigint, n_lsh_candidates bigint, n_lsh_verified bigint, "
            "n_missed bigint, recall_micros bigint, candidate_efficiency_micros bigint",
        ).toPandas()
        ph["emit"] = time.perf_counter() - t0
        print(tag, {k: round(v, 2) for k, v in ph.items()}, "| total",
              round(sum(ph.values()), 2), flush=True)
        print("   counts:", row.asDict(), "exact_cand:", exact_cand.count(),
              "lsh_cand:", lsh_cand.count(), "sets:", sets_df.count(), flush=True)

    for k in range(3):
        try:
            sc._jvm.System.gc()
        except Exception:
            pass
        once(f"run{k}")


if __name__ == "__main__":
    main()
