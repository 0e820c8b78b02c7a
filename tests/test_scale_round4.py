"""Round-4 scale-hardening assertions (VERDICT r3 "Next round" items 2-4,
8, 10 + ADVICE r3): prefix-filter exactness and stopword pruning, adaptive
LSH fallback geometry, array-free LSH candidate exchange, IVF multi-probe
recall, explicit approximate-tier contract, cache invalidation on table
rewrite, and the salted-join balance bound."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from desdb_spark.extensions import ann_lsh, dedup, dedup_near, similarity
from tests.conftest import SF_DIR


# ---------------------------------------------------------------- prefix filter


def _synthetic_docs(spark):
    """Docs over 20 universal stopwords + per-doc rare tokens, with planted
    exact-dup pairs (J=1) and sub-threshold near-pairs (J ≈ 0.83 < 0.9).
    Includes 10-token docs so ⌈0.9·10⌉ hits the integer-arithmetic boundary
    (float 0.9·10 = 9.000000000000002 would shorten the prefix and lose
    exactness)."""
    common = " ".join(f"w{i}" for i in range(20))
    rows = []
    for i in range(30):
        rows.append((2 * i, f"{common} r{i}a r{i}b"))
        rows.append((2 * i + 1, f"{common} r{i}a r{i}b"))  # planted dup, J=1
    # 10-token docs (9 shared stopwords + 1 rare): J vs each other = 9/11.
    rows.append((1000, " ".join(f"w{i}" for i in range(9)) + " x1"))
    rows.append((1001, " ".join(f"w{i}" for i in range(9)) + " x2"))
    # identical 10-token pair: exercises prefix_len = 10 - ceil(9) + 1 = 2.
    rows.append((1002, " ".join(f"w{i}" for i in range(9)) + " x3"))
    rows.append((1003, " ".join(f"w{i}" for i in range(9)) + " x3"))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _brute_force_jaccard_pairs(rows, t=0.9):
    sets = {r.doc_id: set(r.text.split(" ")) for r in rows}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        j = i / (len(sets[a]) + len(sets[b]) - i)
        if j >= t:
            out[(a, b)] = j
    return out


def test_prefix_filter_is_lossless(spark):
    """Every true ≥-threshold pair appears among the prefix-filtered
    candidates (the completeness half of the prefix-filter lemma — the
    speed half is pruning, asserted separately)."""
    docs = _synthetic_docs(spark)
    truth = _brute_force_jaccard_pairs(docs.collect())
    assert truth, "synthetic corpus should contain qualifying pairs"
    cand = {(r.id_a, r.id_b) for r in dedup.prefix_filtered_pairs(docs).collect()}
    assert set(truth) <= cand


@pytest.mark.parametrize("t_num,t_den", [(1, 2), (2, 3), (4, 5), (9, 10)])
def test_prefix_filter_lossless_across_thresholds(spark, t_num, t_den):
    """r12 regression pin for the asymmetric indexing prefix and the
    positional filter: both are threshold-dependent lemma code
    (⌈2t/(1+t)·n⌉ index bound, ⌈t/(1+t)(n_a+n_b)⌉ positional bound), so
    losslessness must hold across the grid the registered ops actually
    use (retention curve 1/2, components 4/5, ngram_jaccard 9/10). The
    synthetic corpus has 20 universal stopwords — every one of them is
    forced hot by a lowered salting threshold, exercising the salted
    replicate/probe path end to end (monkeypatching a module constant
    read at plan-build time)."""
    import desdb_spark.extensions.dedup as dd

    docs = _synthetic_docs(spark)
    truth = _brute_force_jaccard_pairs(docs.collect(), t=t_num / t_den)
    old = dd.HOT_PREFIX_COUNT
    dd.HOT_PREFIX_COUNT = 2  # force the hot path for the universal tokens
    try:
        got = {
            (r.id_a, r.id_b)
            for r in dd.prefix_filtered_pairs(
                docs, t_num=t_num, t_den=t_den
            ).collect()
        }
    finally:
        dd.HOT_PREFIX_COUNT = old
    missing = set(truth) - got
    assert not missing, (
        f"prefix filter at t={t_num}/{t_den} lost qualifying pairs: "
        f"{sorted(missing)[:5]}"
    )
    # Orientation contract: consumers assume id_a < id_b.
    assert all(a < b for a, b in got)


def test_prefix_filter_prunes_stopword_multiplicity(spark):
    """A universal token must appear in almost no prefixes: its join-key
    multiplicity (the d² shuffle driver) collapses, while rare tokens
    survive as keys."""
    docs = _synthetic_docs(spark)
    n_docs = docs.count()
    prefix = dedup.prefix_tokens(docs).cache()
    stop_df = prefix.where(F.col("tok") == "w0").count()
    # w0 is in every doc (df = n_docs); uncapped index would give it
    # multiplicity n_docs. Only the all-stopword 10-token docs may keep it.
    assert stop_df <= n_docs * 0.15, (stop_df, n_docs)
    # Per-doc join-row count shrinks to the prefix length, not |s|.
    per_doc = prefix.groupBy("doc_id").count().agg(F.max("count")).first()[0]
    assert per_doc <= 4  # |s|=22 → prefix 22-20+1=3; |s|=10 → 2
    prefix.unpersist()


def test_registered_ngram_jaccard_matches_duckdb_shape(spark):
    """The registered op (prefix-filtered) returns exactly the brute-force
    truth on the synthetic corpus — candidates are verified, so the filter
    must not add or lose anything."""
    docs = _synthetic_docs(spark)
    truth = _brute_force_jaccard_pairs(docs.collect())
    cand = dedup.prefix_filtered_pairs(docs)
    sets_df = docs.select(
        F.col("doc_id").alias("id"), F.array_distinct(F.split("text", " ")).alias("toks")
    )
    sa, sb = sets_df.alias("sa"), sets_df.alias("sb")
    i = F.size(F.array_intersect("sa.toks", "sb.toks"))
    jac = i.cast("double") / (F.size("sa.toks") + F.size("sb.toks") - i)
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in cand.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(sb, F.col("id_b") == F.col("sb.id"))
        .where(jac >= 0.9)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .collect()
    }
    assert set(got) == set(truth)
    for pair, j in got.items():
        assert abs(j - round(truth[pair], 4)) < 1e-9


# ------------------------------------------------------- adaptive LSH geometry


def test_fallback_geometry_scales_bits():
    bands, bits_small = similarity._fallback_geometry(500)
    assert (bands, bits_small) == (similarity.FALLBACK_BANDS, similarity.FALLBACK_BITS)
    _, bits_2m = similarity._fallback_geometry(2_000_000)
    _, bits_100m = similarity._fallback_geometry(100_000_000)
    assert bits_small < bits_2m < bits_100m
    assert bits_100m <= 24
    # Expected bucket occupancy stays ≈ TARGET at every size.
    for n in (10**5, 10**7, 10**9):
        _, bits = similarity._fallback_geometry(n)
        assert n / 2**bits <= similarity.TARGET_BUCKET_ROWS * 1.01 or bits == 24


def _planted_embeddings(spark, n, dim=64, seed=7):
    """n seeded random unit-ish vectors; the second half are jittered copies
    of the first half (cos ≈ 0.999) — planted near-dup pairs."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n // 2, dim))
    jitter = base + 0.02 * rng.normal(size=(n // 2, dim))
    M = np.vstack([base, jitter])
    rows = [(i, [float(x) for x in M[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    truth = {(i, i + n // 2) for i in range(n // 2)}
    return df, truth


def test_bucketed_pairs_adaptive_bound_and_recall(spark, monkeypatch):
    """Force a small bucket target at two corpus sizes: (a) derived bits
    grow with n and observed max bucket size stays bounded near the target,
    (b) planted near-dup recall stays 1.0 at the higher bit count (cos
    ≈ 0.999 ⇒ per-bit agreement ≈ 0.99, per-band miss over 16 bands ≈ 0)."""
    monkeypatch.setattr(similarity, "TARGET_BUCKET_ROWS", 64)
    sizes = {}
    for n in (256, 1024):
        e, truth = _planted_embeddings(spark, n)
        bands, bits = similarity._fallback_geometry(n)
        sizes[n] = bits
        max_bucket = (
            similarity._banded_sigs(e, bands, bits)
            .groupBy("band", "sig")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        # Gaussian sign bits are balanced; planted dups co-occupy. Allow 4×.
        assert max_bucket <= 4 * 64, (n, bits, max_bucket)
        found = {
            (r.vec_a, r.vec_b)
            for r in similarity._bucketed_pairs(e, threshold=0.9, n_rows=n).collect()
        }
        assert truth <= found, f"missed planted pairs at n={n}"
    assert sizes[1024] > sizes[256]


# --------------------------------------------------------- LSH shuffle payload


def test_lsh_candidate_exchanges_are_array_free(spark):
    """No exchange that carries the (band, sig) signature may also carry an
    embedding array — the candidate join must shuffle ids only (VERDICT r3
    item 4). Checked on the executed plan tree, covering both broadcast and
    shuffle exchange modes."""
    df = ann_lsh.ann_lsh_bucketed(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan()

    nodes = []

    def walk(node):
        nodes.append(node)
        if "AdaptiveSparkPlan" in node.nodeName():
            walk(node.initialPlan())
            return
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(plan)
    sig_exchanges = 0
    for node in nodes:
        if "Exchange" not in node.nodeName():
            continue
        out = node.output()
        names = [out.apply(i).name() for i in range(out.size())]
        types = [out.apply(i).dataType().typeName() for i in range(out.size())]
        if "band" in names and "sig" in names:
            sig_exchanges += 1
            assert "array" not in types, list(zip(names, types))
    assert sig_exchanges > 0, "expected at least one signature exchange in the plan"


# ------------------------------------------------------------------ IVF nprobe


def test_ivf_full_probe_equals_exact_nn(spark):
    """nprobe = k (probe every cell) degenerates IVF to exact global NN —
    the recall/cost knob's endpoint is the brute-force answer."""
    k = similarity._ivf_cell_count(500)
    got = {
        r.vec_id: (r.nn_id, r.cos_sim)
        for r in similarity.ann_ivf_kmeans(spark, SF_DIR, nprobe=k).collect()
    }
    e = similarity.load_table(spark, SF_DIR, "embeddings")
    pairs = similarity._pairs(e)
    sym = pairs.unionByName(
        pairs.select(F.col("vec_b").alias("vec_a"), F.col("vec_a").alias("vec_b"), "cos_sim")
    )
    best = {
        r.vec_a: r.m
        for r in sym.groupBy("vec_a").agg(F.max("cos_sim").alias("m")).collect()
    }
    assert set(got) == set(best)
    for vid, (_, sim) in got.items():
        assert abs(sim - best[vid]) < 1e-9, vid


def test_ivf_nprobe_monotone_recall(spark):
    """More probes can only improve (or tie) each vector's best neighbor."""
    one = {r.vec_id: r.cos_sim for r in similarity.ann_ivf_kmeans(spark, SF_DIR, nprobe=1).collect()}
    two = {r.vec_id: r.cos_sim for r in similarity.ann_ivf_kmeans(spark, SF_DIR, nprobe=2).collect()}
    # A vector alone in its home cell has no nprobe=1 neighbor but gains one
    # with a second probe — coverage can only grow with nprobe.
    assert set(one) <= set(two)
    for vid in one:
        assert two[vid] >= one[vid] - 1e-9


def test_ivf_cell_count_scales():
    assert similarity._ivf_cell_count(500) == similarity.IVF_MIN_CELLS
    assert similarity._ivf_cell_count(2000) == similarity.IVF_MIN_CELLS
    assert similarity._ivf_cell_count(10**6) > similarity.IVF_MIN_CELLS
    # r8 regression guard (SELFCHECK_r08_sf1.log): the old n/4096 rule
    # floored at 8 cells until n > 32k, growing the cell join
    # quadratically between fixture scale and 10x. Occupancy must stay
    # ≈ TARGET through that range...
    assert 20_000 / similarity._ivf_cell_count(20_000) <= (
        similarity.IVF_TARGET_CELL_ROWS * 1.01
    )
    # ...and follow the FAISS-style √n/4 envelope in the sqrt regime
    # (nlist ≈ 4√n), where IVF-PQ is the next tier anyway.
    import math

    for n in (10**6, 10**8, 10**9):
        cap = max(similarity.IVF_TARGET_CELL_ROWS, math.sqrt(n) / 4)
        assert n / similarity._ivf_cell_count(n) <= cap * 1.01
    # Cell count must be monotone in n — a non-monotone rule would let a
    # growing corpus fall back into fewer cells (the fixed-k knee class).
    counts = [similarity._ivf_cell_count(n) for n in
              (10**3, 10**4, 10**5, 10**6, 10**7, 10**8, 10**9)]
    assert counts == sorted(counts)


# ------------------------------------------------------------- tier contract


def test_exact_tier_refuses_approx_when_disallowed(spark, monkeypatch):
    monkeypatch.setattr(similarity, "MAX_EXACT_INDEX_ROWS", 1)
    with pytest.raises(ValueError, match="allow_approx_fallback"):
        similarity.knn_cosine_topk(spark, SF_DIR, allow_approx_fallback=False)
    with pytest.raises(ValueError, match="allow_approx_fallback"):
        similarity.dedup_embedding_cosine(spark, SF_DIR, allow_approx_fallback=False)


# -------------------------------------------------------- cache invalidation


def test_table_rewrite_invalidates_caches(spark, tmp_path):
    """Rewriting a table within one session must refresh both the memoized
    DataFrame (InMemoryFileIndex snapshot) and the similarity row-count
    memo (ADVICE r3 staleness item)."""
    sf_dir = str(tmp_path)
    spark.range(5).select(
        F.col("id").alias("vec_id"), F.array(F.lit(1.0)).alias("embedding")
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")
    assert similarity._embeddings_count(spark, sf_dir) == 5
    spark.range(8).select(
        F.col("id").alias("vec_id"), F.array(F.lit(1.0)).alias("embedding")
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")
    assert similarity._embeddings_count(spark, sf_dir) == 8
    from desdb_spark.session import load_table

    assert load_table(spark, sf_dir, "embeddings").count() == 8


# ------------------------------------------------------------ salted balance


def test_salted_join_bounds_hot_key_tasks(spark):
    """Power-law fact keys: the hot key's max (key, salt) group must shrink
    by ~the salt factor vs the unsalted key group — the per-task bound that
    makes the join survive a skewed 100 TB corpus (VERDICT r2 item 9)."""
    from desdb_spark.operators.joins import salted_join

    salt = 8
    hot = spark.range(9000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(1000).select(
        (F.col("id") % 100 + 2).alias("k").cast("int"), F.col("id").alias("v")
    )
    fact = hot.unionByName(cold)
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(1, 102)], "k int, name string")
    fact = fact.withColumn("k", F.col("k").cast("int"))

    # Correctness first: salted equals plain.
    plain = fact.join(dim, "k").groupBy("k").count()
    salted = salted_join(fact, dim, "k", salt=salt).groupBy("k").count()
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    # Balance: reproduce the salting and measure the hot key's task groups.
    salt_col = F.pmod(F.abs(F.xxhash64(*[F.col(c) for c in fact.columns])), F.lit(salt)).cast("int")
    groups = (
        fact.withColumn("_salt", salt_col)
        .groupBy("k", "_salt")
        .count()
        .where(F.col("k") == 1)
        .collect()
    )
    assert len(groups) == salt, "hot key must spread across all salt slots"
    max_group = max(r["count"] for r in groups)
    unsalted_hot = 9000
    assert max_group <= unsalted_hot / salt * 1.5, max_group
