"""Distributed BPE (byte-pair encoding) merge training.

Classic BPE training (Sennrich et al. 2016, arXiv:1508.07909) never
touches the raw corpus after the first pass: it operates on the
DISTINCT-WORD frequency table (vocabulary-bounded, millions of rows
at web scale — not trillions), repeatedly (1) counting adjacent
symbol pairs weighted by word frequency and (2) merging the most
frequent pair inside every word. That structure maps cleanly onto
Spark:

- ONE corpus pass builds the word-frequency table (tokenize →
  groupBy — the wordcount shuffle; everything after is bounded by
  |vocab|, not corpus size).
- per merge round: a `zip_with(slice, slice)` pair explode +
  partial-agg'd groupBy over the vocab table, a TakeOrdered(1)
  argmax with a deterministic tiebreak (count desc, then pair
  lexicographic — reproducible under any partitioning), and a
  JVM-side `aggregate` fold that rewrites each word's symbol array
  left-to-right (greedy non-overlapping, the reference semantics).
  No Python touches a row; the driver holds only the winning pair
  per round (the kmeans-centroid contract).
- the vocab frame is re-pinned each round (localCheckpoint) so the
  lineage stays one round deep instead of accreting R nested folds.

Applying the trained merges to a corpus goes through the word→tokens
mapping produced by training: a broadcast join against the vocab
table, so the corpus is touched exactly once more.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadron_spark.functions.text import tokenize
from hadron_spark.operators.ops import pin


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Rewrite a symbol array replacing adjacent (a,b) with a||b,
    greedy left-to-right, as one JVM `aggregate` fold. Accumulator:
    (acc: merged prefix, p: pending symbol — '' = none; symbols are
    never empty so the sentinel is unambiguous)."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    zero = F.struct(
        F.expr("cast(array() as array<string>)").alias("acc"),
        F.lit("").alias("p"),
    )

    def step(st: Column, s: Column) -> Column:
        hit = (st["p"] == la) & (s == lb)
        flushed = F.when(st["p"] == F.lit(""), st["acc"]).otherwise(
            F.concat(st["acc"], F.array(st["p"]))
        )
        return F.struct(
            F.when(hit, F.concat(st["acc"], F.array(lab)))
            .otherwise(flushed)
            .alias("acc"),
            F.when(hit, F.lit("")).otherwise(s).alias("p"),
        )

    def finish(st: Column) -> Column:
        return F.when(st["p"] == F.lit(""), st["acc"]).otherwise(
            F.concat(st["acc"], F.array(st["p"]))
        )

    return F.aggregate(syms, zero, step, finish)


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus pass: distinct words with frequencies and their
    initial character-symbol arrays. Everything downstream of this
    frame is |vocab|-bounded."""
    return (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", F.split(F.col("word"), ""))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
):
    """Learn `num_merges` BPE merges from a document frame.

    Returns (merges, vocab):
      merges — list of (left, right, pair_count) in learned order;
               training stops early when no pair repeats.
      vocab  — DataFrame (word, freq, syms) with `syms` in the FINAL
               segmentation — the word→tokens mapping `bpe_apply`
               broadcasts.

    Determinism: the argmax tiebreak is (count desc, left asc,
    right asc) via TakeOrdered — stable under any partitioning, so
    retraining on reshuffled data yields byte-identical merges."""
    vocab = pin(word_freq_table(df, text_col))
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("pr"),
            )
            .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(
            F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
        ).first()
        if top is None or top["cnt"] < 2:
            break
        a, b = top["a"], top["b"]
        merges.append((a, b, int(top["cnt"])))
        vocab = pin(
            vocab.withColumn("syms", _merge_fold(F.col("syms"), a, b))
        )
    return merges, vocab


def bpe_apply(
    df: DataFrame,
    vocab: DataFrame,
    key_cols: list[str],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Per-key BPE token count under a trained vocab: tokenize, join
    each word against the broadcast word→tokens map, sum per
    `key_cols` (small grouping keys — never the text itself). Words
    unseen in training fall back to their character count (the
    untrained-symbol floor). One narrow corpus pass + one broadcast
    join + one partial-agg'd shuffle on the keys — the corpus text
    never shuffles."""
    wl = F.broadcast(vocab.select("word", F.size("syms").alias("_nt")))
    toks = df.select(*key_cols, F.explode(tokenize(F.col(text_col))).alias("_w"))
    return (
        toks.join(wl, toks["_w"] == wl["word"], "left")
        .withColumn("_nt", F.coalesce(F.col("_nt"), F.length("_w")))
        .groupBy(*key_cols)
        .agg(F.sum("_nt").cast("long").alias(out_col))
    )
