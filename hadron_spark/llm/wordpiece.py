"""WordPiece greedy encoding — the third tokenizer family next to
`llm.bpe` (merge-rank BPE) and `llm.unigram` (unigram-LM): encode
text against an EXISTING WordPiece vocabulary (the BERT deployment
case — training one is Schuster & Nakajima 2012 / Wu et al. 2016;
serving corpora are tokenized with a published vocab far more often
than anyone retrains it).

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
