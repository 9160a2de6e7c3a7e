"""Distributed BPE training (llm.bpe) pinned against a pure-Python
reference implementation of Sennrich-style merge learning."""

from __future__ import annotations

from collections import Counter

from hadron_spark.llm import bpe


def ref_bpe(texts: list[str], num_merges: int):
    """Reference BPE: word-frequency table, (count desc, pair asc)
    argmax, greedy left-to-right merge."""
    freq = Counter()
    for t in texts:
        for w in t.split():
            if w:
                freq[w] += 1
    vocab = {w: list(w) for w in freq}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += freq[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab, freq


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low newer wide lowest",
    "the the the a a an",
]


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges, vocab = bpe.bpe_train(df, num_merges=12)
    ref_merges, ref_vocab, _ = ref_bpe(TEXTS, 12)
    assert [(a, b, c) for a, b, c in merges] == ref_merges
    got = {r.word: list(r.syms) for r in vocab.collect()}
    assert got == ref_vocab


def test_bpe_apply_counts(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges, vocab = bpe.bpe_train(df, num_merges=12)
    _, ref_vocab, _ = ref_bpe(TEXTS, 12)
    out = {r.doc_id: r.n_bpe_tokens for r in bpe.bpe_apply(df, vocab, ["doc_id"]).collect()}
    for i, t in enumerate(TEXTS):
        want = sum(len(ref_vocab[w]) for w in t.split() if w)
        assert out[i] == want, (i, out[i], want)
    # unseen words fall back to character count
    df2 = spark.createDataFrame([(99, "zzzz qq")], "doc_id long, text string")
    out2 = bpe.bpe_apply(df2, vocab, ["doc_id"]).collect()[0]
    assert out2.n_bpe_tokens == 6


def test_bpe_early_stop_on_unique_text(spark):
    # every word appears once with all-distinct chars: best pair
    # count is 1 -> training must stop immediately
    df = spark.createDataFrame([("abc def",)], "text string")
    merges, _ = bpe.bpe_train(df, num_merges=5)
    assert merges == []
