"""WordPiece encoding AND training — the third tokenizer family next
to `llm.bpe` (merge-rank BPE) and `llm.unigram` (unigram-LM).

Encoding runs against an EXISTING WordPiece vocabulary (the BERT
deployment case, Wu et al. 2016); `wordpiece_train` learns one with
the likelihood-scored merge loop (Schuster & Nakajima 2012): unlike
BPE's raw pair-count argmax, each round merges the pair maximizing
score = count(a,b) / (count(a) · count(b)) — the corpus
log-likelihood gain of fusing the pair under a unigram model.  The
distributed shape is `bpe_train`'s (VERDICT r4 #2: same scored-merge
rounds over the |vocab|-bounded word-frequency table), with two
WordPiece-specific twists: symbols after the first position carry
the `##` continuation prefix from initialization, and the merged
symbol is `a + strip('##', b)` so prefix status propagates from the
left symbol.

Algorithm (Wu et al. 2016 §4.1, the greedy longest-match-first
reference behavior, identical to HuggingFace WordpieceTokenizer):
per word, repeatedly take the LONGEST vocab piece matching at the
cursor — continuation positions (cursor > 1) look the piece up with
the `##` prefix — and if any position has no match the WHOLE word
becomes [UNK].

Spark-first shape, two deliberate choices:
- The greedy loop is a pure Catalyst `aggregate` over
  sequence(1, len(word)) with a (pos, toks, bad) struct accumulator
  — steps whose index isn't the cursor pass the accumulator through,
  matching steps advance by the matched length.  No Python UDF: the
  whole encoder stays inside whole-stage codegen, and the vocab is
  ONE constant-foldable array literal (the kmeans lesson).
- Encoding runs on DISTINCT WORDS, then joins back to positions:
  a 100 TB corpus has millions of distinct words, not trillions —
  the encode cost is vocabulary-bounded, the join is the only
  corpus-scale pass (broadcast-able: the encoded word table is
  |distinct words| rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def wordpiece_encode(
    df: DataFrame,
    text_col: str,
    vocab: list[str],
    id_col: str = "doc_id",
    unk: str = "[UNK]",
    cont: str = "##",
) -> DataFrame:
    """Greedy longest-match WordPiece over whitespace-pretokenized
    lowercase text.  Returns (id_col, n_tokens, tokens) with
    `tokens` the full piece sequence (continuations keep their
    `##` prefix, the interchange convention).  Deterministic and
    engine-portable: greedy longest-match has no ties (lengths are
    distinct) and all string ops are byte-exact, so the output is
    hash-exact against any engine stating the same greedy fold.
    Documents whose text contains no words emit zero rows (join
    semantics — filter upstream if the empty row matters)."""
    if not vocab:
        raise ValueError("vocab must be non-empty")
    if unk in vocab:
        raise ValueError(f"unk marker {unk!r} must not be a vocab piece")
    max_len = max(
        len(p) - len(cont) if p.startswith(cont) else len(p) for p in vocab
    )
    if max_len < 1:
        raise ValueError("vocab has no usable pieces")
    vlit = "array(" + ",".join(_sql_quote(p) for p in sorted(set(vocab))) + ")"
    best = (
        f"array_max(filter(transform(sequence(1, {max_len}), "
        f"L -> IF(array_contains({vlit}, "
        f"IF(acc.pos = 1, '', {_sql_quote(cont)}) || substr(w, acc.pos, L)), "
        "L, cast(null as int))), x -> x is not null))"
    )
    enc = (
        "aggregate(sequence(1, length(w)), "
        "named_struct('pos', 1, 'toks', cast(array() as array<string>), "
        "'bad', false), "
        "(acc, i) -> IF(acc.bad OR i != acc.pos, acc, named_struct("
        f"'pos', acc.pos + coalesce({best}, length(w) + 1 - acc.pos), "
        f"'toks', IF({best} is null, acc.toks, array_append(acc.toks, "
        f"IF(acc.pos = 1, '', {_sql_quote(cont)}) "
        f"|| substr(w, acc.pos, {best}))), "
        f"'bad', acc.bad OR {best} is null)), "
        f"acc -> IF(acc.bad, array({_sql_quote(unk)}), acc.toks))"
    )
    words = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
            "_wpos", "w"
        ),
    ).filter(F.col("w") != "")
    encoded = words.select("w").distinct().withColumn("_toks", F.expr(enc))
    return (
        words.join(encoded, "w")
        .groupBy("_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_wpos", "_toks"))
            ).alias("_s")
        )
        .select(
            F.col("_id").alias(id_col),
            F.expr(
                "aggregate(_s, cast(0 as bigint), "
                "(a, x) -> a + size(x._toks))"
            ).alias("n_tokens"),
            F.flatten(F.expr("transform(_s, x -> x._toks)")).alias("tokens"),
        )
    )

# ---------------------------------------------------------------------------
# Training (Schuster & Nakajima 2012 likelihood-scored merges)
# ---------------------------------------------------------------------------


def _strip_cont(s: str, cont: str = "##") -> str:
    return s[len(cont):] if s.startswith(cont) else s


def _wp_merge_fold_batch(syms, pairs: list[tuple[str, str, str]]):
    """`bpe._merge_fold_batch` with an EXPLICIT merged symbol per
    pair (WordPiece merges to a + strip('##', b), not a + b):
    rewrite a symbol array applying a symbol-disjoint batch greedy
    left-to-right in one JVM `aggregate` fold.  One map-literal
    lookup per symbol; accumulator ('' = no pending symbol — symbols
    are never empty, split('') on a word never yields '')."""
    m = F.create_map(
        *[
            c
            for a, b, ab in pairs
            for c in (
                F.lit(a),
                F.struct(F.lit(b).alias("b"), F.lit(ab).alias("ab")),
            )
        ]
    )
    zero = F.struct(
        F.expr("cast(array() as array<string>)").alias("acc"),
        F.lit("").alias("p"),
    )

    def step(st, s):
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

    def finish(st):
        return F.when(st["p"] == F.lit(""), st["acc"]).otherwise(
            F.concat(st["acc"], F.array(st["p"]))
        )

    return F.aggregate(syms, zero, step, finish)


def wordpiece_word_table(
    df: DataFrame, text_col: str = "text", cont: str = "##"
) -> DataFrame:
    """The one corpus pass: distinct lowercased words with
    frequencies and their initial WordPiece symbol arrays (first
    char plain, continuations `##`-prefixed).  Everything downstream
    is |word vocab|-bounded — the `bpe.word_freq_table` contract."""
    from hadron_spark.functions.text import tokenize

    return (
        df.select(
            F.explode(tokenize(F.lower(F.col(text_col)))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "syms",
            F.transform(
                F.split(F.col("word"), ""),
                lambda c, i: F.when(i == 0, c).otherwise(
                    F.concat(F.lit(cont), c)
                ),
            ),
        )
    )


def wordpiece_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    merge_batch: int | str = "adaptive",
    floor_frac: float = 0.5,
    cont: str = "##",
    stats: dict | None = None,
    word_table: DataFrame | None = None,
):
    """Learn `num_merges` WordPiece merges from a document frame.

    Returns (merges, vocab):
      merges — list of (left, right, merged, pair_count, score) in
               learned order; score = cnt / (double(count_left) ·
               double(count_right)), measured on the table state at
               the start of the round that selected the pair.
      vocab  — DataFrame (word, freq, syms) with `syms` the FINAL
               training segmentation (continuations `##`-prefixed).

    Per Spark round (all |word vocab|-bounded, the `bpe_train`
    shape — reference semantics Schuster & Nakajima 2012 / the
    HuggingFace WordpieceTrainer scoring rule, public knowledge):
      1. adjacent-pair counts: zip_with slice explode + partial-agg
         groupBy;
      2. per-symbol totals: explode + groupBy (the likelihood
         denominator — the one pass BPE doesn't need);
      3. score = cnt / (ca · cb) with BOTH totals cast to double
         BEFORE the multiply (ca·cb overflows int64 at corpus
         scale; the double form is what the pure-Python parity
         reference mirrors bit-for-bit);
      4. TakeOrdered(K) on (score desc, left asc, right asc) —
         deterministic under any partitioning;
      5. greedy symbol-disjoint batch selection
         (`bpe.select_disjoint_batch` — disjoint merges commute, so
         the one-pass fold apply is byte-identical to sequential
         application; `merge_batch=1` is exact sequential training);
         adaptive mode accepts pairs scoring >= floor_frac · round
         max — same bounded-drift rationale as `bpe_train`;
      6. ONE fold rewriting every word's symbol array; the vocab
         frame re-pins each round (lineage stays one round deep).

    Training stops early when no pair repeats (cnt >= 2).

    `word_table` substitutes a prebuilt/prefiltered
    `wordpiece_word_table` frame for the corpus pass (the
    `wordpiece_train_to_vocab` alphabet-limited path); `df`/
    `text_col` are ignored when it is given."""
    from hadron_spark.llm.bpe import select_disjoint_batch
    from hadron_spark.operators.ops import pin

    adaptive = merge_batch == "adaptive"
    if not adaptive and (not isinstance(merge_batch, int) or merge_batch < 1):
        raise ValueError(
            f"merge_batch must be 'adaptive' or an int >= 1, got {merge_batch!r}"
        )
    if not 0.0 < floor_frac <= 1.0:
        raise ValueError(f"floor_frac must be in (0, 1], got {floor_frac!r}")
    if word_table is None:
        word_table = wordpiece_word_table(df, text_col, cont)
    vocab = pin(word_table)
    merges: list[tuple[str, str, str, int, float]] = []
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
            .filter(F.col("cnt") >= 2)
        )
        sym_cnt = (
            vocab.select("freq", F.explode("syms").alias("s"))
            .groupBy("s")
            .agg(F.sum("freq").alias("c"))
        )
        ca = sym_cnt.select(F.col("s").alias("a"), F.col("c").alias("ca"))
        cb = sym_cnt.select(F.col("s").alias("b"), F.col("c").alias("cb"))
        scored = (
            pairs.join(ca, "a")
            .join(cb, "b")
            .withColumn(
                "score",
                F.col("cnt").cast("double")
                / (F.col("ca").cast("double") * F.col("cb").cast("double")),
            )
        )
        if adaptive:
            k = min(max(1024, 4 * batch_limit), 16384)
        else:
            k = max(8 * batch_limit, 64)
        top = scored.orderBy(
            F.col("score").desc(), F.col("a").asc(), F.col("b").asc()
        ).limit(k)
        cands = [
            (r["a"], r["b"], int(r["cnt"]), float(r["score"]))
            for r in top.collect()
        ]
        if adaptive and cands:
            floor = cands[0][3] * floor_frac
            cands = [c for c in cands if c[3] >= floor]
        rounds += 1
        batch = select_disjoint_batch(
            [(a, b, (cnt, sc)) for a, b, cnt, sc in cands], batch_limit
        )
        if not batch:
            break
        merges.extend(
            (a, b, a + _strip_cont(b, cont), cnt, sc)
            for a, b, (cnt, sc) in batch
        )
        vocab = pin(
            vocab.withColumn(
                "syms",
                _wp_merge_fold_batch(
                    F.col("syms"),
                    [(a, b, a + _strip_cont(b, cont)) for a, b, _ in batch],
                ),
            )
        )
    if stats is not None:
        stats["rounds"] = rounds
    return merges, vocab


def wordpiece_train_to_vocab(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 8000,
    limit_alphabet: int | None = None,
    special_tokens: list[str] | None = None,
    merge_batch: int | str = "adaptive",
    floor_frac: float = 0.5,
    cont: str = "##",
    stats: dict | None = None,
):
    """Train WordPiece to a TARGET VOCAB SIZE — the HuggingFace
    `WordPieceTrainer` contract (vocab_size / limit_alphabet /
    special_tokens; Schuster & Nakajima 2012 scoring underneath),
    the interface anyone reproducing a BERT vocabulary reaches for.
    `wordpiece_train`'s `num_merges` stays the low-level knob; this
    wrapper derives it from the budget.

    HF semantics mirrored (reference: the public `tokenizers`
    BpeTrainer/WordPieceTrainer behavior):
      - the ALPHABET counts toward `vocab_size`: every distinct
        initial symbol that appears in the corpus (plain first-char
        and `##`-continuation forms count separately, exactly the
        symbols the trainer would insert into the vocab) plus the
        special tokens; merges fill the remainder —
        num_merges = vocab_size − |specials| − |alphabet symbols|,
        clamped at 0 (an alphabet larger than vocab_size trains zero
        merges, it does not truncate the alphabet);
      - `limit_alphabet` keeps only the N most frequent CHARACTERS
        (weighted by word frequency, ties broken char-asc for
        determinism — HF leaves ties unspecified); symbols whose
        base char was dropped are REMOVED from the training words,
        and the surviving symbols close ranks (pairs may form across
        the gap — HF's tokenize_words skip behavior);
      - piece order: special_tokens, then alphabet symbols sorted,
        then merge products in learned order (HF's alphabet block is
        sorted; its continuation-form insertion order is
        map-iteration nondeterministic, so we pin sorted —
        documented deviation affecting only piece IDS, never the
        piece SET or the merges).

    Returns (merges, pieces, vocab):
      merges — as `wordpiece_train`;
      pieces — the encode-ready ordered vocab list (length ≤
               vocab_size; feed to `wordpiece_encode` after dropping
               specials that must not match, e.g. keep [UNK] out);
      vocab  — the final training segmentation frame.

    Driver state: |charset| char frequencies + the piece list —
    character/vocab-bounded, never corpus-bounded."""
    from hadron_spark.operators.ops import pin

    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if limit_alphabet is not None and limit_alphabet < 1:
        raise ValueError(
            f"limit_alphabet must be >= 1 or None, got {limit_alphabet}"
        )
    specials = list(special_tokens or [])
    wt = pin(wordpiece_word_table(df, text_col, cont))

    if limit_alphabet is not None:
        # weighted char frequencies (HF compute_alphabet: every char
        # occurrence in a word contributes the word's count)
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
        pos = len(cont) + 1
        wt = wt.withColumn(
            "syms",
            F.filter(
                F.col("syms"),
                lambda s: F.when(
                    s.startswith(cont), F.substring(s, pos, 1)
                ).otherwise(F.substring(s, 1, 1)).isin(kept),
            ),
        ).filter(F.size("syms") > 0)
        wt = pin(wt)

    alphabet = sorted(
        r["s"]
        for r in wt.select(F.explode("syms").alias("s")).distinct().collect()
    )
    budget = max(0, vocab_size - len(specials) - len(alphabet))
    merges, vocab = wordpiece_train(
        df=None,
        num_merges=budget,
        merge_batch=merge_batch,
        floor_frac=floor_frac,
        cont=cont,
        stats=stats,
        word_table=wt,
    )
    pieces: list[str] = []
    seen: set[str] = set()
    for p in specials + alphabet + [m[2] for m in merges]:
        if p not in seen:
            seen.add(p)
            pieces.append(p)
    return merges, pieces, vocab


def wordpiece_alphabet(
    df: DataFrame, text_col: str = "text", cont: str = "##"
) -> list[str]:
    """Initial symbol inventory of a corpus (first-position chars
    plain + `##`-prefixed continuations), sorted.  The ONE bounded
    driver collect of the tokenizer pipeline: |charset| · 2 rows —
    character-set-bounded, not corpus- or vocabulary-bounded."""
    return sorted(
        r["s"]
        for r in wordpiece_word_table(df, text_col, cont)
        .select(F.explode("syms").alias("s"))
        .distinct()
        .collect()
    )


def wordpiece_pieces(
    alphabet: list[str], merges: list[tuple]
) -> list[str]:
    """Assemble the encode-ready piece list from a trained run:
    alphabet first, then merge products in learned order (the
    standard vocab-file layout), deduplicated keeping first
    occurrence.  Feed straight into `wordpiece_encode`."""
    out: list[str] = []
    seen: set[str] = set()
    for p in list(alphabet) + [m[2] for m in merges]:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out
