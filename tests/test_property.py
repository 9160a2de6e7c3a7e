"""Property-based tests (hypothesis) for the pure driver-side
functions the distributed tokenizer/dedup ops delegate to — these
run without a Spark session, so hundreds of generated cases cost
milliseconds."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from hadron_spark.llm.bpe import _encode_word, select_disjoint_batch
from hadron_spark.llm.unigram import _viterbi

WORDS = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=24)
SYMS = st.text(alphabet="abcdef", min_size=1, max_size=3)


@settings(max_examples=200, deadline=None)
@given(
    word=WORDS,
    pairs=st.lists(st.tuples(SYMS, SYMS), min_size=0, max_size=12),
)
def test_encode_word_total_and_lossless(word, pairs):
    """BPE encode never loses or reorders bytes: the concatenation of
    output tokens equals the input word, tokens are non-empty, and
    encoding terminates for ANY rank table (including degenerate
    pairs like (a, a) and pairs over multi-char symbols)."""
    ranks = {p: i for i, p in enumerate(pairs)}
    out = _encode_word(word, ranks)
    assert "".join(out) == word
    assert all(out)


@settings(max_examples=200, deadline=None)
@given(
    cands=st.lists(
        st.tuples(SYMS, SYMS, st.integers(min_value=2, max_value=1000)),
        min_size=0,
        max_size=30,
    ),
    limit=st.integers(min_value=0, max_value=10),
)
def test_select_disjoint_batch_invariants(cands, limit):
    """Selection is a subset in candidate order, at most `limit`
    long, mutually symbol-disjoint, and FIRST-FIT greedy: a candidate
    is skipped only if it conflicts with an earlier acceptance."""
    out = select_disjoint_batch(cands, limit)
    assert len(out) <= limit
    # subset, order-preserving
    it = iter(cands)
    for o in out:
        assert o in cands
        while next(it) != o:
            pass
    # mutual symbol-disjointness
    used: set[str] = set()
    for a, b, _ in out:
        assert a not in used and b not in used
        used.update((a, b))
    # first-fit: walk candidates replaying the rule -> same answer
    used2: set[str] = set()
    replay = []
    for a, b, c in cands:
        if len(replay) >= limit:
            break
        if a in used2 or b in used2:
            continue
        replay.append((a, b, c))
        used2.update((a, b))
    assert out == replay


@settings(max_examples=200, deadline=None)
@given(
    word=WORDS,
    pieces=st.dictionaries(
        st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6),
        st.floats(min_value=-30.0, max_value=-0.01),
        max_size=40,
    ),
    max_len=st.integers(min_value=1, max_value=8),
)
def test_viterbi_total_and_lossless(word, pieces, max_len):
    """Viterbi segmentation is total (any word segments — atom
    fallback) and lossless; every emitted piece is either in the
    model or a single-character atom fallback; no piece exceeds
    max_len unless it is the atom fallback."""
    out = _viterbi(word, pieces, max_len)
    assert "".join(out) == word
    assert all(out)
    in_model = all(p in pieces for p in out)
    all_atoms = all(len(p) == 1 for p in out)
    assert in_model or all_atoms
    if in_model:
        assert all(len(p) <= max_len for p in out)


@settings(max_examples=100, deadline=None)
@given(word=WORDS, max_len=st.integers(min_value=1, max_value=8))
def test_viterbi_prefers_higher_likelihood_than_atoms(word, max_len):
    """With a model containing the whole word as one high-prob piece
    plus all its chars at low prob, Viterbi must take the word."""
    if len(word) > max_len:
        return
    pieces = {c: -10.0 for c in word}
    pieces[word] = -1.0
    assert _viterbi(word, pieces, max_len) == [word]
