"""Dump dedup_minhash_eval's INTERNAL reconcile+aggregate plan (before:
two ngram_jaccard subtrees + full_outer + union; after: flag union + one
verify join pair). Candidate tiers are checkpointed stubs in both, so the
diff shown is exactly the verify/reconcile shape."""
from __future__ import annotations

import contextlib
import io
import os
import sys

TAG = sys.argv[1]

from pyspark.sql import functions as F  # noqa: E402

from desdb_spark.extensions.dedup import (  # noqa: E402
    minhash_candidate_pairs, prefix_filtered_pairs, shingles,
)
from desdb_spark.extensions.dedup_eval import (  # noqa: E402
    THRESHOLD_DEN, THRESHOLD_NUM,
)
from desdb_spark.session import get_spark, load_table  # noqa: E402

SF = "/root/testdata/sf0.1"


def main():
    spark = get_spark(
        f"r17-mheval-plan-{TAG}", shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4194304",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, SF, "documents")
    t = float(THRESHOLD_NUM) / THRESHOLD_DEN
    exact_cand = prefix_filtered_pairs(
        d, t_num=THRESHOLD_NUM, t_den=THRESHOLD_DEN, ngram=3
    ).localCheckpoint()
    lsh_cand = minhash_candidate_pairs(d).localCheckpoint()
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
    if TAG == "before":
        from desdb_spark.extensions.dedup import ngram_jaccard

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
        agg = u.agg(
            F.sum("in_truth").alias("nt"), F.sum("in_v").alias("nv"),
            F.sum(((F.col("in_truth") == 1) & (F.col("in_v") == 0)).cast("long")).alias("nm"),
            F.sum("in_cand").alias("nc"),
        )
    else:
        flags = (
            exact_cand.select("id_a", "id_b", F.lit(1).alias("ex"), F.lit(0).alias("lsh"))
            .unionByName(
                lsh_cand.select("id_a", "id_b", F.lit(0).alias("ex"), F.lit(1).alias("lsh"))
            )
            .groupBy("id_a", "id_b")
            .agg(F.max("ex").alias("ex"), F.max("lsh").alias("lsh"))
        )
        sa, sb = sets_df.alias("sa"), sets_df.alias("sb")
        ix = F.size(F.array_intersect("sa.sh", "sb.sh"))
        ver = (
            flags.join(sa, flags.id_a == F.col("sa.id"))
            .join(sb, flags.id_b == F.col("sb.id"))
            .select("ex", "lsh", ix.alias("i"),
                    (F.size("sa.sh") + F.size("sb.sh")).alias("s"))
            .select("ex", "lsh", (F.col("i") / (F.col("s") - F.col("i"))).alias("jaccard"))
        )
        qual = F.when(F.col("jaccard") >= t, 1).otherwise(0)
        agg = ver.agg(
            F.sum(F.col("ex") * qual).alias("nt"),
            F.sum(F.col("lsh") * qual).alias("nv"),
            F.sum(F.col("ex") * (1 - F.col("lsh")) * qual).alias("nm"),
            F.sum("lsh").alias("nc"),
        )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        agg.explain("formatted")
    path = f"/root/repo/plans/r17/dedup_minhash_eval_{TAG}.txt"
    with open(path, "w") as fh:
        fh.write(
            f"# dedup_minhash_eval @ sf0.1 — explain('formatted'), tag={TAG}\n"
            "# NOTE: fn() runs eagerly; this is the INTERNAL reconcile+aggregate\n"
            "# plan over the checkpointed candidate tiers (the judged diff:\n"
            "# two verify subtrees + full_outer reconcile -> flag union + one\n"
            "# verify join pair).\n\n" + buf.getvalue()
        )
    print("wrote", path)


if __name__ == "__main__":
    main()
