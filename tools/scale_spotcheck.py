"""Scale spot-check (VERDICT r7 item 7): run the slow-by-design exact /
iterative tiers at 10× the largest fixture and record wall-time ratios —
direct evidence the algorithms degrade sub-quadratically, supporting the
100× design claims.

No sf1.0 fixture exists (TESTDATA.md ships sf ≤ 0.1 and /root/testdata is
read-only), so this derives one under /tmp from sf0.1, preserving the
PER-REPLICA data distribution so the ratio measures SCALING, not a
changed workload:

- documents ×10: replica k suffixes every token with ``_k`` — token sets
  are disjoint across replicas, so each replica reproduces sf0.1's exact
  dup/near-dup cluster structure and no cross-replica similarity inflates
  clique sizes (an identical-copy scale-up would create 10-cliques and
  measure a different, artificially quadratic problem).
- embeddings ×10: replica k flips a deterministic per-replica sign
  pattern — within-replica cosines are EXACTLY preserved (both vectors
  flip identically), cross-replica cosines scramble to noise.
- events ×10: replica k offsets user_id/event_id — the interaction graph
  becomes 10 disjoint copies of the sf0.1 graph.

Timings are Spark-side only (the quadratic DuckDB oracles are exactly
what does NOT scale — that asymmetry is the point); correctness at this
scale is covered by the per-replica structure equaling the sf0.1 runs
the differential gate already verifies.

Usage: python tools/scale_spotcheck.py [--out SELFCHECK_r08_sf1.log]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from desdb_spark.registry import all_operators  # noqa: E402
from desdb_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def derived_dir(replicas: int = REPLICAS) -> str:
    """Path of the derived corpus for a replica count (10 → sf1.0 — the
    exact pre-r15 path, so bench.py's sf1 arm reuses the same corpus)."""
    return f"/tmp/desdb_scale/sf{replicas / 10}"


#: The default 10× corpus — bench.py's sf1 arm imports this.
DERIVED = derived_dir()
OPS = [
    "dedup_cluster_components",
    "dedup_ngram_jaccard",
    "dedup_near_minhash",
    # r12c: the dedup-audit op joined after its kernel rework (zip_with
    # shingles + single-intersect verify + checkpointed shared shingle
    # frame) — both its tiers (PPJoin truth, banded MinHash) must stay
    # sub-quadratic. ann_lsh_bucketed deliberately stays OUT: its fixed
    # 8x4 fixture geometry is the recall contract, not the scale path
    # (the N-adaptive _fallback_geometry tier behind
    # knn_cosine_topk_forced_lsh is).
    "dedup_minhash_eval",
    "ann_ivf_kmeans",
    "graph_pagerank_topk",
    # r16 (VERDICT r15 item 4): the r7-vintage families rotating through
    # the r16 driver window predate the sf1/sf3 arms — one representative
    # each so the 30× point covers a stateful stream fold (RocksDB-less
    # applyInPandasWithState over staged files), the d²-partial Gram
    # matrix, and the broadcast/LSH-tiered hard-negative miner.
    "stream_stateful_profile",
    "emb_gram_matrix",
    "knn_hard_negatives",
]


def build_derived(replicas: int = REPLICAS) -> None:
    import duckdb

    dest = derived_dir(replicas)
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    # tables no spot-checked op scales over: straight copies
    for t in "region nation customer supplier part".split():
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{dest}/{t}.parquet")
    # pagerank's graph comes from orders+lineitem: replica k offsets the
    # keys so the customer-supplier graph becomes 10 disjoint copies
    con.execute(f"""
        COPY (
            SELECT o.* REPLACE (
                o.o_orderkey + k.k * 100000000 AS o_orderkey,
                o.o_custkey + k.k * 10000000 AS o_custkey)
            FROM read_parquet('{SRC}/orders.parquet') o,
                 (SELECT unnest(generate_series(0, {replicas - 1})) AS k) k
        ) TO '{dest}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
            SELECT l.* REPLACE (
                l.l_orderkey + k.k * 100000000 AS l_orderkey,
                l.l_suppkey + k.k * 1000000 AS l_suppkey)
            FROM read_parquet('{SRC}/lineitem.parquet') l,
                 (SELECT unnest(generate_series(0, {replicas - 1})) AS k) k
        ) TO '{dest}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
            SELECT d.doc_id + k.k * 10000000 AS doc_id,
                   CASE WHEN k.k = 0 THEN d.text
                        ELSE replace(d.text, ' ', '_' || k.k || ' ')
                             || '_' || k.k END AS text,
                   d.lang, d.source, d.n_chars
            FROM read_parquet('{SRC}/documents.parquet') d,
                 (SELECT unnest(generate_series(0, {replicas - 1})) AS k) k
        ) TO '{dest}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
            SELECT e.vec_id + k.k * 10000000 AS vec_id,
                   CASE WHEN k.k = 0 THEN e.embedding ELSE
                     list_transform(
                       list_zip(e.embedding,
                                generate_series(1, len(e.embedding))),
                       p -> CASE WHEN ((p[2] * 31 + k.k * 17) % 3) = 0
                                 THEN -p[1] ELSE p[1] END)
                   END AS embedding,
                   e.label
            FROM read_parquet('{SRC}/embeddings.parquet') e,
                 (SELECT unnest(generate_series(0, {replicas - 1})) AS k) k
        ) TO '{dest}/embeddings.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
            SELECT e.event_id + k.k * 100000000 AS event_id, e.ts,
                   e.user_id + k.k * 10000000 AS user_id,
                   e.event_type, e.value, e.props
            FROM read_parquet('{SRC}/events.parquet') e,
                 (SELECT unnest(generate_series(0, {replicas - 1})) AS k) k
        ) TO '{dest}/events.parquet' (FORMAT PARQUET)
    """)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--append", action="store_true",
                    help="append to --out instead of truncating")
    ap.add_argument("--replicas", type=int, default=REPLICAS,
                    help="scale multiplier: N disjoint replicas of sf0.1 "
                         "(default 10 = the sf1.0 arm; 30 gives a second "
                         "scaling point so the wall-vs-rows trend is a "
                         "curve, not a single ratio)")
    ap.add_argument("names", nargs="*",
                    help="operator names to spot-check (default: the "
                         "slow-by-design exact/iterative set)")
    args = ap.parse_args()
    global OPS
    if args.names:
        OPS = args.names
    out = open(args.out, "a" if args.append else "w") if args.out else sys.stdout

    def emit(line: str) -> None:
        print(line)
        if args.out:
            out.write(line + "\n")
            out.flush()

    n_rep = args.replicas
    dest = derived_dir(n_rep)
    # Label uses the same n_rep/10 float rendering as derived_dir's
    # path suffix (10 → label "sf1.0x", dir ".../sf1.0") so every
    # committed log since r8 stays grep-comparable round-over-round
    # (post-review fix: a :g label drifted to "sf1x"/"sf3").
    big = f"sf{n_rep / 10}x"
    emit(f"# scale spot-check: sf0.1 fixtures vs derived {n_rep}x (see "
         "tools/scale_spotcheck.py header for the derivation)")
    t0 = time.perf_counter()
    build_derived(n_rep)
    emit(f"derived dataset built under {dest} "
         f"({time.perf_counter() - t0:.1f}s)")
    # local-mode default is a 1 GB driver JVM; the 10x edge sets
    # (cluster_components materializes ~30M edges via localCheckpoint)
    # thrash GC there. Size the heap for the spot-check — this conf only
    # takes effect when this process creates the JVM, so run standalone.
    spark = get_spark(
        "scale_spotcheck",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ops = all_operators()
    # Sub-quadratic sanity line: wall ratio for N x rows should sit far
    # under the N^2 a quadratic algorithm would pay; N^2/2 is the same
    # midline the original 10x arm used (50).
    threshold = n_rep * n_rep / 2
    for name in OPS:
        times = {}
        for label, sf_dir in (("sf0.1", SRC), (big, dest)):
            t0 = time.perf_counter()
            n = ops[name].fn(spark, sf_dir).count()
            times[label] = time.perf_counter() - t0
            emit(f"rows  {name} @ {label}: {n} rows ({times[label]:.1f}s)")
        ratio = times[big] / max(times["sf0.1"], 1e-9)
        emit(f"ratio {name}: {ratio:.1f}x wall for {n_rep}.0x rows "
             f"({'sub-quadratic OK' if ratio < threshold else 'CHECK'})")
    if args.out:
        out.close()


if __name__ == "__main__":
    main()
