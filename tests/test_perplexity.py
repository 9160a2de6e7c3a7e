"""CCNet-style stupid-backoff perplexity filter: pure-Python parity
(the DSIR discipline — ln() isn't cross-engine bit-stable so the
registry rows-only entries are backed by these reference tests),
integer backoff-decision checks, determinism, and the band cut."""

import math
import re
import zlib

import pytest
from pyspark.sql import functions as F

from hadron_spark.llm.perplexity import (
    NgramLM,
    backoff_summary,
    ngram_lm_train,
    perplexity_band,
    perplexity_scores,
)

REF = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog sat",
    "the mat and the rug",
]
TGT = [
    (1, "the cat sat on the mat"),
    (2, "zyx qwv foo bar baz"),
    (3, "the dog sat on the mat"),
    (4, "a cat sat on a rug"),
    (5, "cat"),
]


def _tok(t):
    return [w for w in re.split(r"\s+", t) if w]


def _py_counts(texts, order, n_buckets=None):
    counts = {}
    for t in texts:
        toks = _tok(t)
        for n in range(1, order + 1):
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                k = (
                    g
                    if n_buckets is None
                    else zlib.crc32(g.encode()) % n_buckets
                )
                counts[(n, k)] = counts.get((n, k), 0) + 1
    T = sum(c for (n, _), c in counts.items() if n == 1)
    V = sum(1 for (n, _) in counts if n == 1)
    return counts, T, V


def _py_positions(toks, counts, T, V, order, n_buckets=None, alpha=0.4):
    """Per-position (ord_used, num, den, logp) — the module's
    documented semantics, independently re-derived."""

    def key(g):
        return (
            g if n_buckets is None else zlib.crc32(g.encode()) % n_buckets
        )

    out = []
    for p in range(1, len(toks) + 1):
        n_avail = min(order, p)
        chosen = None
        for n in range(n_avail, 1, -1):
            g = " ".join(toks[p - n : p])
            ctx = " ".join(toks[p - n : p - 1])
            if (n, key(g)) in counts and (n - 1, key(ctx)) in counts:
                chosen = (n, counts[(n, key(g))], counts[(n - 1, key(ctx))])
                break
        if chosen is None:
            c = counts.get((1, key(toks[p - 1])), 0)
            chosen = (1, c + 1, T + V + 1)
        n, num, den = chosen
        lp = math.log(num / den) + (n_avail - n) * math.log(alpha)
        out.append((n, num, den, lp))
    return out


def _py_doc_scores(order, n_buckets=None):
    counts, T, V = _py_counts(REF, order, n_buckets)
    scores = {}
    for i, t in TGT:
        toks = _tok(t)
        ps = _py_positions(toks, counts, T, V, order, n_buckets)
        scores[i] = sum(x[3] for x in ps) / len(ps)
    return scores


@pytest.fixture(scope="module")
def frames(spark):
    ref = spark.createDataFrame([(t,) for t in REF], "text string")
    tgt = spark.createDataFrame(TGT, "doc_id long, text string")
    return ref, tgt


def test_lm_train_counts_match_python(spark, frames):
    ref, _ = frames
    lm = ngram_lm_train(ref, order=3)
    counts, T, V = _py_counts(REF, 3)
    got = {(r["n"], r["gram"]): r["cnt"] for r in lm.counts.collect()}
    assert got == counts
    assert (lm.total_tokens, lm.vocab) == (T, V)


@pytest.mark.parametrize("n_buckets", [None, 64, 1 << 20])
def test_scores_match_python(spark, frames, n_buckets):
    """Exact mode AND hashed mode (including a deliberately tiny
    bucket table where collisions are certain) reproduce the
    pure-Python stupid-backoff to float tolerance."""
    ref, tgt = frames
    lm = ngram_lm_train(ref, order=3, n_buckets=n_buckets)
    want = _py_doc_scores(3, n_buckets)
    got = {
        r["doc_id"]: r["logprob_per_token"]
        for r in perplexity_scores(tgt, lm).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_backoff_summary_integer_exact(spark, frames):
    ref, tgt = frames
    lm = ngram_lm_train(ref, order=3)
    counts, T, V = _py_counts(REF, 3)
    want = {}
    for i, t in TGT:
        ps = _py_positions(_tok(t), counts, T, V, 3)
        want[i] = (
            len(ps),
            sum(x[0] for x in ps),
            sum(x[1] for x in ps),
            sum(x[2] for x in ps),
        )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["sum_order"],
            r["sum_num"],
            r["sum_den"],
        )
        for r in backoff_summary(tgt, lm).collect()
    }
    assert got == want


def test_scores_deterministic_under_repartition(spark, frames):
    ref, tgt = frames
    lm = ngram_lm_train(ref.repartition(5), order=2, n_buckets=1 << 16)
    a = {
        r["doc_id"]: r["logprob_per_token"]
        for r in perplexity_scores(tgt, lm).collect()
    }
    b = {
        r["doc_id"]: r["logprob_per_token"]
        for r in perplexity_scores(tgt.repartition(7), lm).collect()
    }
    assert a == b  # bit-identical, not approx


def test_band_cut_drops_garbage(spark, frames):
    """The OOV-garbage doc is the perplexity tail; band membership
    matches the documented disc-threshold spec computed directly on
    the pure-Python scores (so tie behavior is exercised, not
    assumed away)."""
    ref, tgt = frames
    lm = ngram_lm_train(ref, order=3)
    scores = _py_doc_scores(3)

    def disc(q):  # smallest element with cumulative distribution >= q
        s = sorted(scores.values())
        return s[max(1, math.ceil(q * len(s))) - 1]

    def expect(lo, hi):
        return sorted(
            i
            for i, v in scores.items()
            if (hi == 1.0 or v > disc(1 - hi))
            and (lo == 0.0 or v <= disc(1 - lo))
        )

    for lo, hi in [(0.0, 0.8), (0.2, 0.8), (0.0, 1.0), (0.4, 1.0)]:
        kept = sorted(
            r["doc_id"]
            for r in perplexity_band(
                tgt, lm, keep_lo=lo, keep_hi=hi
            ).collect()
        )
        assert kept == expect(lo, hi), (lo, hi)
    # the garbage doc is the strict tail: any hi < 1 cut removes it
    assert 2 not in sorted(
        r["doc_id"] for r in perplexity_band(tgt, lm, keep_hi=0.8).collect()
    )


def test_empty_and_validation(spark, frames):
    ref, tgt = frames
    lm = ngram_lm_train(ref, order=2)
    empty = spark.createDataFrame(
        [(9, ""), (10, "   ")], "doc_id long, text string"
    )
    assert perplexity_scores(empty, lm).count() == 0
    with pytest.raises(ValueError, match="order"):
        ngram_lm_train(ref, order=0)
    with pytest.raises(ValueError, match="alpha"):
        ngram_lm_train(ref, order=2, alpha=1.5)
    with pytest.raises(ValueError, match="keep_lo"):
        perplexity_band(tgt, lm, keep_lo=0.5, keep_hi=0.5)


def test_longer_history_never_ignored(spark, frames):
    """A position whose trigram was seen must use order 3 (no silent
    shortcut to lower orders): every ord_used==3 position in the
    in-domain doc corresponds to a reference trigram."""
    ref, tgt = frames
    lm = ngram_lm_train(ref, order=3)
    from hadron_spark.llm.perplexity import _position_frame

    pos = _position_frame(
        tgt.filter(F.col("doc_id") == 1), lm, "doc_id", "text"
    ).collect()
    counts, _, _ = _py_counts(REF, 3)
    toks = _tok(TGT[0][1])
    for r in sorted(pos, key=lambda r: r["p"]):
        p = r["p"]
        if p >= 3:
            tri = " ".join(toks[p - 3 : p])
            if (3, tri) in counts:
                assert r["ord_used"] == 3


@pytest.mark.parametrize("n_buckets", [None, 1 << 16])
def test_lm_save_load_roundtrip(spark, frames, tmp_path, n_buckets):
    """train -> save -> load scores byte-identically in both key
    modes (the tokenizer-checkpoint discipline applied to the LM)."""
    from hadron_spark.llm.perplexity import load_lm, save_lm

    ref, tgt = frames
    lm = ngram_lm_train(ref, order=3, n_buckets=n_buckets)
    path = str(tmp_path / f"lm_{n_buckets}")
    save_lm(lm, path)
    lm2 = load_lm(spark, path)
    assert (lm2.total_tokens, lm2.vocab, lm2.order, lm2.n_buckets, lm2.alpha) == (
        lm.total_tokens,
        lm.vocab,
        lm.order,
        lm.n_buckets,
        lm.alpha,
    )
    a = {
        r["doc_id"]: r["logprob_per_token"]
        for r in perplexity_scores(tgt, lm).collect()
    }
    b = {
        r["doc_id"]: r["logprob_per_token"]
        for r in perplexity_scores(tgt, lm2).collect()
    }
    assert a == b
