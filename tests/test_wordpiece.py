"""WordPiece greedy encoder: python-reference parity (the HuggingFace
WordpieceTokenizer greedy longest-match semantics), [UNK] whole-word
behavior, repartition determinism, and validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadron_spark.llm.wordpiece import wordpiece_encode

VOCAB = [
    "un", "##aff", "##able", "cat", "##s", "run", "##ting", "the",
    "##ning", "q", "##q", "zap", "a", "##a", "b", "##b",
]


def ref_encode(text: str, vocab: list[str], unk="[UNK]", cont="##"):
    vs = set(vocab)
    max_len = max(len(p) - len(cont) if p.startswith(cont) else len(p) for p in vocab)
    out = []
    for w in text.lower().split():
        pos, toks, bad = 0, [], False
        while pos < len(w):
            best = None
            for L in range(min(max_len, len(w) - pos), 0, -1):
                piece = ("" if pos == 0 else cont) + w[pos : pos + L]
                if piece in vs:
                    best = piece
                    pos += L
                    break
            if best is None:
                bad = True
                break
            toks.append(best)
        out.extend([unk] if bad else toks)
    return out


def test_wordpiece_python_parity(spark):
    texts = [
        "unaffable cat runs THE catting",
        "zap!! qq aa ab ba",
        "a  b   unrun",  # multiple spaces collapse
        "tac",  # greedy dead-ends on 'tac' -> t not in vocab -> UNK
        "aaaa bbbb",
        "cats catsrun runcats",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["tokens"])
        for r in wordpiece_encode(df, "text", VOCAB).collect()
    }
    for i, t in enumerate(texts):
        want = ref_encode(t, VOCAB)
        assert got[i] == (len(want), want), f"doc {i}: {got[i]} != {want}"


def test_wordpiece_repartition_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "unaffable cat zap qq" * (i % 3 + 1)) for i in range(40)],
        "doc_id long, text string",
    )
    a = {
        r["doc_id"]: r["tokens"]
        for r in wordpiece_encode(df, "text", VOCAB).collect()
    }
    b = {
        r["doc_id"]: r["tokens"]
        for r in wordpiece_encode(df.repartition(7), "text", VOCAB).collect()
    }
    assert a == b and len(a) == 40


def test_wordpiece_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        wordpiece_encode(df, "text", [])
    with pytest.raises(ValueError):
        wordpiece_encode(df, "text", ["a", "[UNK]"])
    # doc with no words emits no row
    empty = spark.createDataFrame([(1, "   "), (2, "a")], "doc_id long, text string")
    rows = wordpiece_encode(empty, "text", VOCAB).collect()
    assert [r["doc_id"] for r in rows] == [2]
