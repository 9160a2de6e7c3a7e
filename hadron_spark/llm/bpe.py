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
- per Spark round: a `zip_with(slice, slice)` pair explode +
  partial-agg'd groupBy over the vocab table, a TakeOrdered(K)
  candidate collect with a deterministic order (count desc, then
  pair lexicographic — reproducible under any partitioning), a
  driver-side greedy selection of up to `merge_batch` mutually
  SYMBOL-DISJOINT pairs from that order, and ONE JVM-side
  `aggregate` fold that applies the whole batch while rewriting
  each word's symbol array left-to-right (greedy non-overlapping).
  No Python touches a row; the driver holds only the winning pairs
  per round (the kmeans-centroid contract).
- Symbol-disjoint merges commute and cannot create, destroy, or
  consume each other's adjacencies (the merged symbol `ab` is new,
  and no other selected pair mentions `a` or `b`), so applying the
  batch in one pass is byte-identical to applying its members
  sequentially in selection order.  This is the standard
  distributed-BPE batching rule; with `merge_batch=1` it degrades
  exactly to classic sequential Sennrich training.  Batching cuts
  driver-coordinated rounds from `num_merges` to roughly
  `num_merges / merge_batch` — the difference between a 32k-vocab
  train being 32k Spark jobs and being ~2k.
- the vocab frame is re-pinned each round (localCheckpoint) so the
  lineage stays one round deep instead of accreting R nested folds.

Applying the trained merges to a corpus goes through the word→tokens
mapping produced by training: a broadcast join against the vocab
table, so the corpus is touched exactly once more.
"""

from __future__ import annotations

import math

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


def _merge_fold_batch(syms: Column, pairs: list[tuple[str, str]]) -> Column:
    """Rewrite a symbol array applying a SYMBOL-DISJOINT batch of
    merges in one greedy left-to-right pass.  Because the pairs
    share no symbols, all lefts are distinct, so the batch compiles
    to ONE map literal `left -> (right, merged)` and the fold does a
    single O(1) map lookup per symbol regardless of batch size — the
    codegen cost does not grow a `when` chain per pair.  Accumulator
    contract matches `_merge_fold` ('' = no pending symbol)."""
    m = F.create_map(
        *[
            c
            for a, b in pairs
            for c in (
                F.lit(a),
                F.struct(F.lit(b).alias("b"), F.lit(a + b).alias("ab")),
            )
        ]
    )
    zero = F.struct(
        F.expr("cast(array() as array<string>)").alias("acc"),
        F.lit("").alias("p"),
    )

    def step(st: Column, s: Column) -> Column:
        e = F.element_at(m, st["p"])
        hit = e.isNotNull() & (e["b"] == s)
        flushed = F.when(st["p"] == F.lit(""), st["acc"]).otherwise(
            F.concat(st["acc"], F.array(st["p"]))
        )
        return F.struct(
            F.when(hit, F.concat(st["acc"], F.array(e["ab"])))
            .otherwise(flushed)
            .alias("acc"),
            F.when(hit, F.lit("")).otherwise(s).alias("p"),
        )

    def finish(st: Column) -> Column:
        return F.when(st["p"] == F.lit(""), st["acc"]).otherwise(
            F.concat(st["acc"], F.array(st["p"]))
        )

    return F.aggregate(syms, zero, step, finish)


def select_disjoint_batch(
    candidates: list[tuple[str, str, int]], limit: int
) -> list[tuple[str, str, int]]:
    """Greedy batched-BPE selection: walk candidates in (count desc,
    pair asc) priority order, accept a pair iff it shares no symbol
    with any already-accepted pair, stop at `limit`.  Pure function
    so the pure-Python test reference can call the identical rule."""
    used: set[str] = set()
    out: list[tuple[str, str, int]] = []
    for a, b, cnt in candidates:
        if len(out) >= limit:
            break
        if a in used or b in used:
            continue
        out.append((a, b, cnt))
        used.update((a, b))
    return out


def word_freq_table(
    df: DataFrame, text_col: str = "text", mode: str = "char"
) -> DataFrame:
    """The one corpus pass: distinct words with frequencies and their
    initial symbol arrays. Everything downstream of this frame is
    |vocab|-bounded.

    `mode="char"` — character symbols (classic Sennrich; unseen-word
    chars are the fallback floor).  `mode="byte"` — BYTE-LEVEL
    symbols: the word's UTF-8 bytes as 2-char hex pairs (the
    GPT-family production mode, where no [UNK] is reachable by
    construction — any text is a byte sequence and the 256 one-byte
    symbols are the alphabet floor; GPT-2 maps bytes to printable
    unicode for its vocab files, hex pairs are the engine-portable
    equivalent domain — decode any piece with `unhex`/
    `bytes.fromhex`).  The hex split is one regexp over ONE hex()
    evaluation per row (a transform-lambda over substring would
    re-evaluate the outer hex per element)."""
    if mode not in ("char", "byte"):
        raise ValueError(f"mode must be 'char' or 'byte', got {mode!r}")
    syms = (
        F.split(F.col("word"), "")
        if mode == "char"
        else F.expr(
            "filter(split(regexp_replace(hex(encode(word, 'UTF-8')), "
            "'(..)', '$1,'), ','), x -> x != '')"
        )
    )
    return (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", syms)
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    merge_batch: int | str = "adaptive",
    floor_frac: float = 0.5,
    stats: dict | None = None,
    mode: str = "char",
    word_table: DataFrame | None = None,
):
    """Learn `num_merges` BPE merges from a document frame.

    Returns (merges, vocab):
      merges — list of (left, right, pair_count) in learned order;
               counts are measured on the table state at the start
               of the round that selected the pair.  Training stops
               early when no pair repeats.
      vocab  — DataFrame (word, freq, syms) with `syms` in the FINAL
               segmentation — the word→tokens mapping `bpe_apply`
               broadcasts.

    Pairs are learned in batches per Spark round (batched BPE): each
    round counts pairs once, collects the top candidates, and
    greedily accepts mutually symbol-disjoint pairs in (count desc,
    pair asc) order — disjointness makes the one-pass batch apply
    byte-identical to applying those pairs sequentially (see module
    docstring).  `merge_batch` sizes the batch:
    - "adaptive" (DEFAULT — the VERDICT-r3 fix for the ~2k-round
      32k-vocab train): accept ALL disjoint pairs whose count is
      >= max(2, ceil(round_max_count * floor_frac)) — the standard
      distributed-BPE batching rule (a frequency floor bounds how
      far the batch can drift from sequential pick order, since any
      pair above half the max would be merged within the next few
      sequential steps anyway).  Rounds collapse from
      num_merges/16 to O(hundreds) at 32k vocab.
    - an int N: fixed cap of N pairs per round (the r3 behavior);
      `merge_batch=1` is exactly classic sequential BPE.
    Pass a dict as `stats` to receive {"rounds": N} for round-count
    assertions.

    Determinism: the candidate order is (count desc, left asc,
    right asc) via TakeOrdered — stable under any partitioning, so
    retraining on reshuffled data yields byte-identical merges.

    `mode="byte"` trains BYTE-LEVEL BPE (see `word_freq_table`):
    symbols are UTF-8 byte hex pairs, merges concatenate them, and
    the merge machinery is unchanged — the only difference is the
    initial alphabet, which makes [UNK] unreachable at encode time."""
    adaptive = merge_batch == "adaptive"
    if not adaptive and (
        not isinstance(merge_batch, int) or merge_batch < 1
    ):
        raise ValueError(
            f"merge_batch must be 'adaptive' or an int >= 1, got {merge_batch!r}"
        )
    if not 0.0 < floor_frac <= 1.0:
        raise ValueError(f"floor_frac must be in (0, 1], got {floor_frac!r}")
    if word_table is None:
        word_table = word_freq_table(df, text_col, mode)
    vocab = pin(word_table)
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    while len(merges) < num_merges:
        remaining = num_merges - len(merges)
        batch_limit = remaining if adaptive else min(merge_batch, remaining)
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
        # Oversample candidates: conflicts skip, so the accepted set
        # usually fills even when top pairs share hot symbols.
        # Adaptive mode caps the collect at 16k tiny rows — if the
        # above-floor set is truncated, the round merely accepts
        # fewer pairs and the next round picks up the rest.
        if adaptive:
            k = min(max(1024, 4 * batch_limit), 16384)
        else:
            k = max(8 * batch_limit, 64)
        top = pairs.orderBy(
            F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
        ).limit(k)
        cands = [
            (r["a"], r["b"], int(r["cnt"]))
            for r in top.collect()
            if r["cnt"] >= 2
        ]
        if adaptive and cands:
            floor = max(2, math.ceil(cands[0][2] * floor_frac))
            cands = [c for c in cands if c[2] >= floor]
        rounds += 1
        batch = select_disjoint_batch(cands, batch_limit)
        if not batch:
            break
        merges.extend(batch)
        vocab = pin(
            vocab.withColumn(
                "syms",
                _merge_fold_batch(
                    F.col("syms"), [(a, b) for a, b, _ in batch]
                ),
            )
        )
    if stats is not None:
        stats["rounds"] = rounds
    return merges, vocab


def _initial_syms(word: str, mode: str) -> list[str]:
    """Initial symbol sequence of a word: chars, or UTF-8 byte hex
    pairs (uppercase, matching Spark's hex())."""
    if mode == "byte":
        h = word.encode("utf-8").hex().upper()
        return [h[i : i + 2] for i in range(0, len(h), 2)]
    return list(word)


def bpe_train_to_vocab(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 8000,
    limit_alphabet: int | None = None,
    special_tokens: list[str] | None = None,
    merge_batch: int | str = "adaptive",
    floor_frac: float = 0.5,
    mode: str = "char",
    stats: dict | None = None,
):
    """Train BPE to a TARGET VOCAB SIZE — the HuggingFace `BpeTrainer`
    contract (vocab_size / limit_alphabet / special_tokens), the
    companion to `llm.wordpiece.wordpiece_train_to_vocab` for the
    merge-rank family.  `num_merges` stays the low-level knob; this
    wrapper derives it from the budget.

    Semantics (mirroring the public `tokenizers` BpeTrainer):
      - the alphabet counts toward `vocab_size`: specials + distinct
        initial symbols, merges fill the remainder (clamped at 0 —
        an over-budget alphabet trains zero merges, never truncates);
      - `limit_alphabet` (char mode only) keeps the N most frequent
        characters weighted by word frequency (ties char-asc); words
        shed dropped symbols and close ranks (HF's tokenize_words
        skip behavior);
      - BYTE mode counts the alphabet as ALL 256 one-byte symbols
        (GPT-2 ships the full byte alphabet so no input can fall
        outside the vocab — `initial_alphabet=ByteLevel.alphabet()`
        in HF terms); `limit_alphabet` is rejected there, since
        dropping bytes would reintroduce unencodable input;
      - pieces: specials, then the alphabet sorted, then merge
        products in learned order.

    Returns (merges, pieces, vocab) — shapes as `bpe_train` plus the
    ordered piece list (length ≤ vocab_size in char mode; byte mode
    can exceed it only if vocab_size < 256 + |specials|)."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if mode not in ("char", "byte"):
        raise ValueError(f"mode must be 'char' or 'byte', got {mode!r}")
    if limit_alphabet is not None:
        if mode == "byte":
            raise ValueError(
                "limit_alphabet is char-mode only: dropping bytes would "
                "make some inputs unencodable, defeating byte-level BPE"
            )
        if limit_alphabet < 1:
            raise ValueError(
                f"limit_alphabet must be >= 1 or None, got {limit_alphabet}"
            )
    specials = list(special_tokens or [])
    wt = pin(word_freq_table(df, text_col, mode))

    if limit_alphabet is not None:
        char_freq = (
            wt.select(
                "freq",
                F.explode(
                    F.filter(F.split(F.col("word"), ""), lambda c: c != "")
                ).alias("c"),
            )
            .groupBy("c")
            .agg(F.sum("freq").alias("n"))
            .collect()
        )
        ranked = sorted(char_freq, key=lambda r: (-r["n"], r["c"]))
        kept = sorted(r["c"] for r in ranked[:limit_alphabet])
        wt = pin(
            wt.withColumn(
                "syms", F.filter(F.col("syms"), lambda s: s.isin(kept))
            ).filter(F.size("syms") > 0)
        )

    if mode == "byte":
        alphabet = [f"{b:02X}" for b in range(256)]
    else:
        alphabet = sorted(
            r["s"]
            for r in wt.select(F.explode("syms").alias("s"))
            .distinct()
            .collect()
        )
    budget = max(0, vocab_size - len(specials) - len(alphabet))
    merges, vocab = bpe_train(
        df=None,
        num_merges=budget,
        merge_batch=merge_batch,
        floor_frac=floor_frac,
        stats=stats,
        mode=mode,
        word_table=wt,
    )
    pieces: list[str] = []
    seen: set[str] = set()
    for p in specials + alphabet + [a + b for a, b, _ in merges]:
        if p not in seen:
            seen.add(p)
            pieces.append(p)
    return merges, pieces, vocab


def _encode_word(word: str, ranks: dict, mode: str = "char") -> list[str]:
    """Classic BPE encode of ONE word under a trained merge-rank
    table: repeatedly apply the best-ranked (earliest-learned) pair
    present, merging all its occurrences greedy left-to-right — the
    exact apply-side mirror of the training fold, so in-vocab words
    reproduce their training segmentation byte-for-byte and unseen
    words get proper subword pieces instead of a fallback.  In byte
    mode the floor is the 256 one-byte symbols — NO input can fail
    to encode."""
    syms = _initial_syms(word, mode)
    while len(syms) > 1:
        best_rank = None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
        if best_rank is None:
            break
        a, b = None, None
        for x, y in zip(syms, syms[1:]):
            if ranks.get((x, y)) == best_rank:
                a, b = x, y
                break
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_table(
    df: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    mode: str = "char",
) -> DataFrame:
    """(word, n, toks) — segment every DISTINCT word of `df` under a
    trained merge list (from `bpe_train`), including words the
    training corpus never saw.

    Scale shape: one corpus tokenize+distinct pass (the wordcount
    shuffle), then a mapInPandas Python encode over the
    |vocab|-bounded distinct-word table with the merge-rank dict
    broadcast — the corpus text itself never enters Python.  The
    result is the broadcastable word→tokens map for any downstream
    counter/segmenter.  `mode` must match the training mode ("byte"
    segments over hex-pair byte symbols — lossless and [UNK]-free on
    ANY input by construction, pinned by the hypothesis round-trip
    property in test_bpe)."""
    if mode not in ("char", "byte"):
        raise ValueError(f"mode must be 'char' or 'byte', got {mode!r}")
    ranks = {(a, b): i for i, (a, b, *_rest) in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)
    words = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def enc(batches):
        import pandas as pd

        r = bc.value
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n": pdf["n"],
                    "toks": [_encode_word(w, r, mode) for w in pdf["word"]],
                }
            )

    return words.mapInPandas(enc, "word string, n long, toks array<string>")


def bytelevel_decode(piece: str) -> bytes:
    """Raw bytes of a byte-mode piece (hex pairs → bytes); join a
    word's pieces and `.decode('utf-8')` to recover the text."""
    return bytes.fromhex(piece)


def bpe_apply(
    df: DataFrame,
    vocab: DataFrame,
    key_cols: list[str],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
    mode: str = "char",
) -> DataFrame:
    """Per-key BPE token count under a trained vocab: tokenize, join
    each word against the broadcast word→tokens map, sum per
    `key_cols` (small grouping keys — never the text itself). Words
    unseen in training fall back to the untrained-symbol floor —
    character count in char mode, UTF-8 BYTE count in byte mode
    (`mode` must match training). One narrow corpus pass + one
    broadcast join + one partial-agg'd shuffle on the keys — the
    corpus text never shuffles."""
    if mode not in ("char", "byte"):
        raise ValueError(f"mode must be 'char' or 'byte', got {mode!r}")
    floor = (
        F.length("_w")
        if mode == "char"
        else F.octet_length(F.encode(F.col("_w"), "UTF-8"))
    )
    wl = F.broadcast(vocab.select("word", F.size("syms").alias("_nt")))
    toks = df.select(*key_cols, F.explode(tokenize(F.col(text_col))).alias("_w"))
    return (
        toks.join(wl, toks["_w"] == wl["word"], "left")
        .withColumn("_nt", F.coalesce(F.col("_nt"), floor.cast("int")))
        .groupBy(*key_cols)
        .agg(F.sum("_nt").cast("long").alias(out_col))
    )


def save_merges(merges: list[tuple], spark, path: str) -> None:
    """Persist a trained merge list as parquet (rank, left, right,
    cnt) — the tokenizer checkpoint. Rank IS the row's position in
    the learned order; `load_merges` restores the exact list, so
    train → save → load → `bpe_encode_table` reproduces the training
    segmentation byte-for-byte (round-trip pinned in test_bpe)."""
    rows = [
        (i, a, b, int(c)) for i, (a, b, c) in enumerate(merges)
    ]
    spark.createDataFrame(
        rows, "rank int, left string, right string, cnt long"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[tuple]:
    """Restore a `save_merges` checkpoint in learned order."""
    return [
        (r["left"], r["right"], int(r["cnt"]))
        for r in spark.read.parquet(path).orderBy("rank").collect()
    ]
