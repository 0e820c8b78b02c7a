"""r17 session-2 probe 4: ann_lsh_bucketed — selectExpr signature prototype.

lsh_signature() builds 8x4 plane dots as F.lit Column trees (64 py4j
round-trips per plane = 2048 per fn) and executes them as interpreted
zip_with/aggregate HOFs. The r15 bm25 finding says both costs move to
near-zero when the expression is ONE SQL string: a single JVM-side
parse, and an explicit integer sum-of-products codegens as straight-line
arithmetic (no per-element HOF interpretation). Integer addition is
associative/exact, so the signature bits are bit-identical by
construction; this probe proves output parity against the registered op
and A/Bs the full cell.

Run:  python3 plans/r17/probes/r17_annlsh_probe4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "..")))

from pyspark.sql import functions as F

from desdb_spark.session import get_spark, load_tables, load_table
from desdb_spark.registry import all_operators

SF_DIR = "/root/testdata/sf0.1"


def band_sig_sql(planes_slice) -> str:
    """One band's sign-bit signature as a SQL string over column `eq`."""
    bits = []
    for p in planes_slice:
        s = " + ".join(f"({int(w)})*eq[{i}]" for i, w in enumerate(p))
        bits.append(f"(CASE WHEN {s} >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(bits)


def main():
    spark = get_spark(
        "annlsh-probe4",
        shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4194304",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF_DIR)
    ops = all_operators()

    from desdb_spark.extensions.similarity import dot, l2_norm, quantized_planes
    from desdb_spark.extensions.dedup import ensure_parallelism

    dim, bands, bits = 64, 8, 4
    planes = quantized_planes(dim, bands * bits)

    def fn_sql(spark, sf_dir):
        e = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
        band_arr = ", ".join(
            band_sig_sql(planes[b * bits:(b + 1) * bits]) for b in range(bands)
        )
        sigs = (
            e.selectExpr(
                "vec_id AS id",
                "transform(CAST(embedding AS ARRAY<DOUBLE>), "
                "x -> CAST(round(x * 1000000) AS BIGINT)) AS eq",
            )
            .selectExpr("id", f"posexplode(array({band_arr})) AS (band, sig)")
            .localCheckpoint()
        )
        a, b = sigs.alias("a"), sigs.alias("b")
        cand = (
            a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig")) & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("vec_a"), F.col("b.id").alias("vec_b"))
            .distinct()
        )
        emb = F.col("embedding").cast("array<double>")
        vecs = e.select(F.col("vec_id").alias("id"), emb.alias("emb"), l2_norm(emb).alias("nrm"))
        ea, eb = vecs.alias("ea"), vecs.alias("eb")
        return (
            cand.join(ea, F.col("vec_a") == F.col("ea.id"))
            .join(eb, F.col("vec_b") == F.col("eb.id"))
            .select(
                "vec_a", "vec_b",
                F.round(dot(F.col("ea.emb"), F.col("eb.emb")) / (F.col("ea.nrm") * F.col("eb.nrm")), 6).alias("cos_sim"),
            )
            .where(F.col("cos_sim") >= 0.45)
            .orderBy("vec_a", "vec_b")
        )

    # Parity first: bit-identical output vs the registered op.
    ref = ops["ann_lsh_bucketed"].fn(spark, SF_DIR).toPandas()
    new = fn_sql(spark, SF_DIR).toPandas()
    same = ref.equals(new)
    print(f"parity: rows ref={len(ref)} new={len(new)} equal={same}")
    if not same:
        print(ref.compare(new).head(20) if len(ref) == len(new) else "row count differs")
        return

    # A/B, bench-style fresh-plan runs.
    for label, f in (("registered", ops["ann_lsh_bucketed"].fn), ("selectExpr", fn_sql)):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = f(spark, SF_DIR)
            t1 = time.perf_counter()
            df.toPandas()
            t2 = time.perf_counter()
            runs.append((t1 - t0, t2 - t1, t2 - t0))
        for fn_t, ex_t, tot in runs:
            print(f"{label}: fn()={fn_t:.3f} execute={ex_t:.3f} total={tot:.3f} s")


if __name__ == "__main__":
    main()
