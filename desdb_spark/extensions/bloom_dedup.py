"""Round-9: Bloom-filter incremental line dedup — the memory-bounded
production shape (public practice: AI2's Dolma deduplicates paragraphs
against a Bloom filter of everything already ingested; exact-index
probing — our ``dedup_incremental_new_batch`` — is the precise variant,
the Bloom tier is the one that still fits when the corpus index
doesn't). Given an existing corpus (fixture stand-in: even doc_ids) and
a new batch (odd doc_ids), report per new document how many of its
pseudo-lines the Bloom filter flags as already-seen, next to the exact
truth — so the op measures its own false-positive behavior on every
run.

DIFFERENTIALLY VERIFIED approximate structure: the filter uses the
repo's portable md5-affine hash family (``minhash_signature``'s
construction — base x = md5(line) first 60 bits mod P, then K affine
maps mod P mod M_BITS), so the exact bit pattern, every membership
decision, and every false positive are deterministic and recomputed by
the DuckDB oracle — the LSH/MinHash hash-upgrade discipline applied to
a Bloom filter.

Scale shape: the filter is built as a WORD TABLE (word index → 32-bit
word, one bit_or aggregation with map-side combine) — never a
driver-side bitset of the data's size; M_BITS is a CONFIG constant, so
collecting the ≤ M_BITS/32-row table into a literal array for the
codegen probe is bounded by configuration, not by data (the fixture's
64 Kbit filter is 2 KiB; a production multi-GiB filter skips the
collect and LEFT-joins the probe stream on word index — same plan minus
the literal, noted inline). The probe side shuffles (doc_id, md5)
digests only; the exact-truth join is digest-keyed. Line construction
is the line_dedup module's {LINE_W}-token window stand-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.extensions.dedup import MH_P, _mh_a, _mh_b
from desdb_spark.extensions.line_dedup import LINE_W
from desdb_spark.registry import register
from desdb_spark.session import load_table

#: Filter geometry: M_BITS bits as 32-bit words, K_HASHES probe bits.
M_BITS = 65_536
M_WORDS = M_BITS // 32
K_HASHES = 4


def _pos_sql(k: int, x: str) -> str:
    """The k-th portable bit position of base hash ``x`` (SQL text —
    identical arithmetic in Spark and DuckDB; A_k·x < P² < 2⁶³)."""
    return f"((({_mh_a(k)} * {x} + {_mh_b(k)}) % {MH_P}) % {M_BITS})"


@register(
    "dedup_bloom_lines_incremental",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), lines AS (
            SELECT doc_id,
                   array_to_string(
                       t[i*{LINE_W}+1 : i*{LINE_W}+{LINE_W}], ' ') AS lt
            FROM toks,
                 unnest(range(0, (len(t)+{LINE_W - 1})//{LINE_W})) AS r(i)
        ), ax AS (
            SELECT DISTINCT
                   CAST(('0x' || substr(md5(lt), 1, 15)) AS BIGINT)
                       % {MH_P} AS x,
                   lt
            FROM lines WHERE doc_id % 2 = 0
        ), apos AS (
            SELECT {_pos_sql(0, "x")} AS pos FROM ax
            UNION ALL SELECT {_pos_sql(1, "x")} FROM ax
            UNION ALL SELECT {_pos_sql(2, "x")} FROM ax
            UNION ALL SELECT {_pos_sql(3, "x")} FROM ax
        ), words AS (
            SELECT pos // 32 AS widx,
                   bit_or(CAST(1 AS BIGINT)
                          << CAST(pos % 32 AS INT)) AS w
            FROM apos GROUP BY pos // 32
        ), bl AS (
            SELECT doc_id, lt, count(*) AS cnt,
                   CAST(('0x' || substr(md5(lt), 1, 15)) AS BIGINT)
                       % {MH_P} AS x
            FROM lines WHERE doc_id % 2 = 1
            GROUP BY doc_id, lt
        ), probed AS (
            SELECT b.doc_id, b.lt, b.cnt,
                   {" AND ".join(
                       f"coalesce((SELECT (w.w & (CAST(1 AS BIGINT) << "
                       f"CAST({_pos_sql(k, 'b.x')} % 32 AS INT))) != 0 "
                       f"FROM words w "
                       f"WHERE w.widx = {_pos_sql(k, 'b.x')} // 32), "
                       f"FALSE)"
                       for k in range(K_HASHES)
                   )} AS bloom_hit,
                   EXISTS (SELECT 1 FROM ax a WHERE a.lt = b.lt)
                       AS true_dup
            FROM bl b
        )
        SELECT doc_id,
               CAST(sum(cnt) AS BIGINT) AS n_lines,
               CAST(sum(CASE WHEN bloom_hit THEN cnt ELSE 0 END)
                    AS BIGINT) AS n_bloom_hits,
               CAST(sum(CASE WHEN true_dup THEN cnt ELSE 0 END)
                    AS BIGINT) AS n_true_dups
        FROM probed GROUP BY doc_id
        ORDER BY doc_id
    """,
    group="bloom_dedup",
)
def dedup_bloom_lines_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per new-batch document: pseudo-line count, lines the corpus Bloom
    filter flags as seen, and the exact truth — n_bloom_hits ≥
    n_true_dups always (no false negatives, by construction), and the
    gap is the measured false-positive mass at this (M_BITS, K_HASHES,
    corpus) load."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    t = F.col("t")
    n_lines = F.ceil(F.size(t) / F.lit(LINE_W)).cast("int")
    line_at = lambda i: F.concat_ws(" ", F.slice(t, i * LINE_W + 1, LINE_W))  # noqa: E731
    lines = (
        d.select("doc_id", toks.alias("t"))
        .where(F.size("t") > 0)
        .select(
            "doc_id",
            F.explode(
                F.transform(F.sequence(F.lit(0), n_lines - 1), line_at)
            ).alias("lt"),
        )
        .select("doc_id", F.md5("lt").alias("h"))
    )
    x_of_h = (
        F.conv(F.substring("h", 1, 15), 16, 10).cast("long") % F.lit(MH_P)
    )

    # Build: the corpus side's distinct line hashes → K bit positions →
    # one bit_or word aggregation (map-side combinable; ≤ M_WORDS rows).
    a_digests = (
        lines.where(F.col("doc_id") % 2 == 0).select("h").distinct()
    )
    a_pos = a_digests.select(x_of_h.alias("x")).select(
        F.explode(
            F.array(*[F.expr(_pos_sql(k, "x")) for k in range(K_HASHES)])
        ).alias("pos")
    )
    word_rows = (
        a_pos.select(
            F.expr("cast(pos div 32 as int)").alias("widx"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(pos % 32 as int))"
            ).alias("m"),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(m)").alias("w"))
        .collect()
    )
    # M_WORDS is configuration, not data — the dense literal is 2 KiB at
    # the fixture geometry. Past literal-friendly sizes, keep `word_rows`
    # as a DataFrame and LEFT-join the probe stream on widx instead.
    bloom = [0] * M_WORDS
    for r in word_rows:
        bloom[r.widx] = r.w

    # Probe: digest-keyed per-(doc, line) counts, then a pure-codegen
    # membership test against the literal word array — no explode, no
    # join on the probe path.
    b_counts = (
        lines.where(F.col("doc_id") % 2 == 1)
        .groupBy("doc_id", "h")
        .agg(F.count("*").alias("cnt"))
        .select("doc_id", "h", "cnt", x_of_h.alias("x"))
        .withColumn("bloom", F.lit(bloom))
    )
    hit = None
    for k in range(K_HASHES):
        hk = F.expr(
            f"(element_at(bloom, cast({_pos_sql(k, 'x')} div 32 as int) + 1)"
            f" & shiftleft(cast(1 as bigint),"
            f" cast({_pos_sql(k, 'x')} % 32 as int))) != 0"
        )
        hit = hk if hit is None else (hit & hk)
    probed = b_counts.withColumn("bloom_hit", hit).join(
        a_digests.withColumn("true_dup", F.lit(True)), "h", "left"
    )
    return (
        probed.groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_lines"),
            F.sum(F.when(F.col("bloom_hit"), F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_bloom_hits"),
            F.sum(
                F.when(F.col("true_dup").isNotNull(), F.col("cnt")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_true_dups"),
        )
        .orderBy("doc_id")
    )
