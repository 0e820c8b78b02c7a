"""Round-8: the BPE merge LOOP — completing the tokenizer-training
story whose counting primitive landed in extensions/tokenizer_ext.py.
Byte-pair-encoding training (Sennrich et al. 2016, public literature)
is: count adjacent symbol pairs over the word-frequency table, merge
the most frequent pair everywhere, repeat.

Scale shape — the part that makes this trainable at 100 TB:

- the corpus is scanned ONCE, to build the word-frequency table
  (groupBy word — the classic BPE compression: iterations run over
  distinct words weighted by count, a table orders of magnitude
  smaller than the corpus and independent of corpus growth once the
  vocabulary saturates);
- each merge round is one pair-explode + weighted count on that table
  (map-side combinable, alphabet²-ish key space), ONE driver scalar
  (the argmax pair — the fitted-parameter pattern, like logreg's
  gradient step), and one codegen'd array-aggregate rewrite of the
  symbol sequences; the word table is localCheckpoint-ed per round so
  plans stay flat (the connected-components discipline);
- total cost = 1 corpus scan + K small-table rounds.

Rows-only: the loop's argmax/rewrite rounds are not SQL-expressible as
one query; tests/test_bpe_train.py pins the FULL merge sequence (pair
chosen each round, its weighted frequency, and the final vocabulary
size) against an independent pure-Python BPE reference with identical
greedy left-to-right, non-overlapping merge semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table, values_frame

N_MERGES = 12


def word_freq_symbols(d: DataFrame) -> DataFrame:
    """(syms array<string>, freq bigint): the word-frequency table with
    each word exploded into single-character symbols — BPE's working
    set. The ONLY full-corpus pass in the algorithm."""
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    syms = F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
    return words.select(syms.alias("syms"), "freq")


def _pair_counts(wf: DataFrame) -> DataFrame:
    pairs = F.expr(
        "transform(sequence(1, size(syms) - 1), "
        "i -> named_struct('l', element_at(syms, i), "
        "'r', element_at(syms, i + 1)))"
    )
    return (
        wf.where(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("pair_freq"))
    )


def _merge_pair(wf: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every symbol sequence with (left, right) merged, greedy
    left-to-right and non-overlapping (after a merge the new token is
    the previous symbol, so 'AAA' under (A,A) becomes [AA, A] — the
    standard BPE semantics, mirrored exactly by the test reference)."""
    L, R, LR = F.lit(left), F.lit(right), F.lit(left + right)
    new_syms = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == L) & (s == R),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(LR)),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return wf.select(new_syms.alias("syms"), "freq")


def train_bpe_merges(d: DataFrame, n_merges: int = N_MERGES):
    """Run the merge loop; returns (merge list [(left, right, freq)],
    final word-freq DataFrame)."""
    wf = word_freq_symbols(d).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(wf)
            .orderBy(F.col("pair_freq").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        (row,) = top
        merges.append((row.l, row.r, int(row.pair_freq)))
        wf = _merge_pair(wf, row.l, row.r).localCheckpoint()
    return merges, wf


@register("text_bpe_apply_stats", group="bpe_train")  # rows-only: uses trained merges
def text_bpe_apply_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the merges, then APPLY them to the corpus and report the
    compression: symbols before, tokens after, ratio in exact micros —
    the number that tells a tokenizer team whether K merges were worth
    it. Application chains the K known merge rewrites into ONE plan over
    the word-frequency table (the merges are constants once trained, so
    unlike training there is no per-round action — Catalyst fuses all K
    array-aggregates into a single projection) and weights by word
    frequency, so corpus-level totals come from the compressed table.

    Rows-only (depends on the trained merges); the pytest checks the
    totals against the reference tokenizer applied per word.
    """
    d = load_table(spark, sf_dir, "documents")
    merges, _ = train_bpe_merges(d)
    wf = word_freq_symbols(d)
    before = wf
    for left, right, _freq in merges:
        wf = _merge_pair(wf, left, right)
    row = (
        before.select(
            (F.size("syms") * F.col("freq")).alias("b"), F.lit(0).alias("a")
        )
        .unionByName(
            wf.select(
                F.lit(0).alias("b"), (F.size("syms") * F.col("freq")).alias("a")
            )
        )
        .agg(
            F.sum("b").cast("bigint").alias("symbols_before"),
            F.sum("a").cast("bigint").alias("tokens_after"),
        )
        .first()
    )
    ratio_micros = (1_000_000 * int(row.tokens_after)) // max(
        int(row.symbols_before), 1
    )
    # r17: inline VALUES emit (see values_frame).
    return values_frame(
        spark,
        [
            (
                len(merges),
                int(row.symbols_before),
                int(row.tokens_after),
                ratio_micros,
            )
        ],
        "n_merges int, symbols_before bigint, tokens_after bigint, "
        "compression_micros bigint",
    )


@register("text_bpe_train_merges", group="bpe_train")  # rows-only: iterative loop
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train N_MERGES BPE merges on the corpus and report the merge
    table — (rank, left, right, merged, pair_freq) per round — plus a
    final row (rank = -1) with the resulting symbol-vocabulary size:
    the artifact a tokenizer-training pipeline persists.
    """
    d = load_table(spark, sf_dir, "documents")
    merges, wf = train_bpe_merges(d)
    vocab = (
        wf.select(F.explode("syms").alias("s")).agg(
            F.countDistinct("s").alias("n")
        ).first()[0]
    )
    rows = [
        (i, left, right, left + right, freq)
        for i, (left, right, freq) in enumerate(merges)
    ]
    rows.append((-1, None, None, None, int(vocab)))
    # r17: inline VALUES emit (see values_frame).
    return values_frame(
        spark,
        rows,
        "rank int, left string, right string, merged string, pair_freq bigint",
    ).orderBy("rank")
