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


# ---------------------------------------------------------------------------
# Training (wordpiece_train) — pure-Python full-loop parity
# ---------------------------------------------------------------------------

from collections import Counter

from hadron_spark.llm.wordpiece import (
    wordpiece_alphabet,
    wordpiece_pieces,
    wordpiece_train,
)

CORPUS = [
    "hugging hugging hugs hug bug bugs rug rugs",
    "hug hugs hugger mugs mug muggy",
    "bug rug hug hug pug pugs pun puns",
    "hugging bugs rugs hugs muggy pug",
]


def _ref_train(texts, num_merges, merge_batch=1, floor_frac=0.5, cont="##"):
    """Pure-Python mirror of wordpiece_train: same scoring (double
    mult BEFORE divide), same (score desc, pair asc) order, same
    disjoint batching, same greedy left-to-right fold apply."""
    freq = Counter(w for t in texts for w in t.lower().split())
    vocab = {
        w: [c if i == 0 else cont + c for i, c in enumerate(w)]
        for w in freq
    }
    adaptive = merge_batch == "adaptive"
    merges = []
    while len(merges) < num_merges:
        remaining = num_merges - len(merges)
        limit = remaining if adaptive else min(merge_batch, remaining)
        pc, sc = Counter(), Counter()
        for w, syms in vocab.items():
            f = freq[w]
            for s in syms:
                sc[s] += f
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        cands = [
            (a, b, n, n / (float(sc[a]) * float(sc[b])))
            for (a, b), n in pc.items()
            if n >= 2
        ]
        cands.sort(key=lambda t: (-t[3], t[0], t[1]))
        if adaptive and cands:
            floor = cands[0][3] * floor_frac
            cands = [c for c in cands if c[3] >= floor]
        used, batch = set(), []
        for a, b, n, s in cands:
            if len(batch) >= limit:
                break
            if a in used or b in used:
                continue
            batch.append((a, b, n, s))
            used.update((a, b))
        if not batch:
            break
        bmap = {
            (a, b): a + (b[len(cont):] if b.startswith(cont) else b)
            for a, b, _, _ in batch
        }
        merges.extend(
            (a, b, bmap[(a, b)], n, s) for a, b, n, s in batch
        )
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) in bmap:
                    out.append(bmap[(syms[i], syms[i + 1])])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


@pytest.mark.parametrize("batch", [1, "adaptive"])
def test_wordpiece_train_python_parity(spark, batch):
    df = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id long, text string"
    )
    merges, vocab = wordpiece_train(
        df, num_merges=10, merge_batch=batch
    )
    want_merges, want_vocab = _ref_train(CORPUS, 10, merge_batch=batch)
    assert merges == want_merges
    got_vocab = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert got_vocab == want_vocab


def test_wordpiece_train_deterministic_under_repartition(spark):
    df = spark.createDataFrame(
        list(enumerate(CORPUS * 3)), "doc_id long, text string"
    )
    m1, _ = wordpiece_train(df, num_merges=8)
    m2, _ = wordpiece_train(df.repartition(7), num_merges=8)
    assert m1 == m2 and len(m1) > 0


def test_wordpiece_train_encode_roundtrip(spark):
    """Trained pieces feed wordpiece_encode: every training word
    re-encodes losslessly (no [UNK] — the alphabet covers every
    char) and, on this fixture, greedy longest-match reproduces the
    training segmentation byte-for-byte."""
    df = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id long, text string"
    )
    merges, vocab = wordpiece_train(df, num_merges=10)
    pieces = wordpiece_pieces(wordpiece_alphabet(df), merges)
    words = sorted(r["word"] for r in vocab.select("word").collect())
    wdf = spark.createDataFrame(
        list(enumerate(words)), "doc_id long, text string"
    )
    enc = {
        words[r["doc_id"]]: list(r["tokens"])
        for r in wordpiece_encode(wdf, "text", pieces).collect()
    }
    train_seg = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    for w in words:
        toks = enc[w]
        assert "[UNK]" not in toks
        respelled = toks[0] + "".join(t[2:] for t in toks[1:])
        assert respelled == w
        assert toks == train_seg[w], (w, toks, train_seg[w])


def test_wordpiece_train_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        wordpiece_train(df, merge_batch=0)
    with pytest.raises(ValueError):
        wordpiece_train(df, floor_frac=0.0)
    # nothing repeats -> zero merges, stats records the single round
    stats = {}
    merges, _ = wordpiece_train(
        spark.createDataFrame([(1, "x y z")], "doc_id long, text string"),
        num_merges=5,
        stats=stats,
    )
    assert merges == [] and stats["rounds"] == 1


def _ref_train_to_vocab(texts, vocab_size, limit_alphabet=None,
                        special_tokens=(), cont="##"):
    """Pure-Python mirror of wordpiece_train_to_vocab's HF-contract
    bookkeeping: weighted char frequencies, limit_alphabet truncation
    (count desc, char asc), symbol filtering with rank-closing, the
    alphabet-counts-toward-vocab_size budget, and the pieces order."""
    freq = Counter(w for t in texts for w in t.lower().split())
    cf = Counter()
    for w, n in freq.items():
        for c in w:
            cf[c] += n
    kept = set(cf)
    if limit_alphabet is not None:
        ranked = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = {c for c, _ in ranked[:limit_alphabet]}
    words = {}
    for w, n in freq.items():
        syms = [
            (c if i == 0 else cont + c)
            for i, c in enumerate(w)
            if c in kept
        ]
        if syms:
            words[w] = syms
    alphabet = sorted({s for syms in words.values() for s in syms})
    budget = max(0, vocab_size - len(special_tokens) - len(alphabet))
    # reuse _ref_train's merge loop on the FILTERED words: rebuild a
    # synthetic corpus is wrong (rank-closing isn't splittable), so
    # inline the same loop seeded with `words`
    merges = []
    vocab = dict(words)
    while len(merges) < budget:
        pc, sc = Counter(), Counter()
        for w, syms in vocab.items():
            f = freq[w]
            for s in syms:
                sc[s] += f
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        cands = [
            (a, b, n, n / (float(sc[a]) * float(sc[b])))
            for (a, b), n in pc.items()
            if n >= 2
        ]
        cands.sort(key=lambda t: (-t[3], t[0], t[1]))
        if cands:
            floor = cands[0][3] * 0.5
            cands = [c for c in cands if c[3] >= floor]
        used, batch = set(), []
        for a, b, n, s in cands:
            if len(batch) >= budget - len(merges):
                break
            if a in used or b in used:
                continue
            batch.append((a, b, n, s))
            used.update((a, b))
        if not batch:
            break
        bmap = {
            (a, b): a + (b[len(cont):] if b.startswith(cont) else b)
            for a, b, _, _ in batch
        }
        merges.extend((a, b, bmap[(a, b)], n, s) for a, b, n, s in batch)
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) in bmap:
                    out.append(bmap[(syms[i], syms[i + 1])])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    pieces, seen = [], set()
    for p in list(special_tokens) + alphabet + [m[2] for m in merges]:
        if p not in seen:
            seen.add(p)
            pieces.append(p)
    return merges, pieces, vocab


def test_wordpiece_train_to_vocab_hf_contract(spark):
    """vocab_size/limit_alphabet/special_tokens semantics (the HF
    WordPieceTrainer contract) against the pure-Python mirror:
    alphabet + specials count toward the budget, limit_alphabet drops
    the rarest chars with rank-closing symbol removal, pieces come
    out specials → sorted alphabet → merges-in-order, and the whole
    run caps at vocab_size."""
    from hadron_spark.llm.wordpiece import wordpiece_train_to_vocab

    df = spark.createDataFrame(
        list(enumerate(CORPUS * 2)), "doc_id long, text string"
    )
    specials = ["[PAD]", "[UNK]"]
    merges, pieces, vocab = wordpiece_train_to_vocab(
        df, vocab_size=40, special_tokens=specials
    )
    wm, wp, wv = _ref_train_to_vocab(CORPUS * 2, 40, special_tokens=specials)
    assert pieces == wp
    assert merges == wm
    assert len(pieces) <= 40
    assert pieces[:2] == specials
    got_vocab = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert got_vocab == wv

    # limit_alphabet: drop rare chars; words shed those symbols but
    # keep training on the survivors
    m2, p2, v2 = wordpiece_train_to_vocab(
        df, vocab_size=40, limit_alphabet=8, special_tokens=specials
    )
    wm2, wp2, wv2 = _ref_train_to_vocab(
        CORPUS * 2, 40, limit_alphabet=8, special_tokens=specials
    )
    assert p2 == wp2 and m2 == wm2
    assert {r["word"]: list(r["syms"]) for r in v2.collect()} == wv2
    # the limited alphabet is genuinely smaller
    alpha_full = [p for p in pieces if len(p.replace("##", "")) == 1]
    alpha_lim = [p for p in p2 if len(p.replace("##", "")) == 1]
    assert len(alpha_lim) < len(alpha_full)

    # alphabet larger than the budget -> zero merges, not truncation
    m3, p3, _ = wordpiece_train_to_vocab(df, vocab_size=3)
    assert m3 == [] and len(p3) > 3

    with pytest.raises(ValueError):
        wordpiece_train_to_vocab(df, vocab_size=0)
    with pytest.raises(ValueError):
        wordpiece_train_to_vocab(df, vocab_size=10, limit_alphabet=0)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=6),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_wordpiece_train_property_parity(spark, words, num_merges):
    """Hypothesis: on ANY small corpus, sequential (merge_batch=1)
    distributed training reproduces the pure-Python reference loop
    merge-for-merge and segmentation-for-segmentation."""
    texts = [" ".join(words)]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges, vocab = wordpiece_train(df, num_merges=num_merges, merge_batch=1)
    want_merges, want_vocab = _ref_train(texts, num_merges, merge_batch=1)
    assert merges == want_merges
    assert {r["word"]: list(r["syms"]) for r in vocab.collect()} == want_vocab
