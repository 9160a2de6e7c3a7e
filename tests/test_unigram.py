"""Unigram-LM tokenizer training (llm.unigram) pinned against a
pure-Python reference of the same hard-EM + prune loop (Kudo 2018)."""

from __future__ import annotations

import math
from collections import Counter

from hadron_spark.llm import unigram as U


def ref_word_freq(texts):
    freq = Counter()
    for t in texts:
        for w in t.split():
            if w:
                freq[w] += 1
    return freq


def ref_seed(freq, seed_size, max_len):
    score = Counter()
    for w, f in freq.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_len) + 1):
                score[w[i:j]] += f
    multi = sorted(
        ((p, s) for p, s in score.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_size]
    chars = [(p, s) for p, s in score.items() if len(p) == 1]
    seeds = dict(multi) | dict(chars)
    total = sum(seeds.values()) or 1
    return {p: math.log(s / total) for p, s in seeds.items()}


def ref_em_round(freq, logp, atoms, max_len):
    counts = Counter()
    for w, f in freq.items():
        for p in U._viterbi(w, logp, max_len):
            counts[p] += f
    tot = sum(counts.values()) or 1
    new = {p: math.log(c / tot) for p, c in counts.items()}
    floor = math.log(0.5 / tot)
    for a in atoms:
        new.setdefault(a, floor)
    return new


def ref_train(texts, vocab_size, seed_size, max_len, em_iters, shrink):
    freq = ref_word_freq(texts)
    logp = ref_seed(freq, seed_size, max_len)
    atoms = {p for p in logp if len(p) == 1}
    target = max(vocab_size, len(atoms))
    while True:
        for _ in range(em_iters):
            logp = ref_em_round(freq, logp, atoms, max_len)
        n_prunable = len(logp) - len(atoms)
        keep_n = max(target - len(atoms), 0)
        if n_prunable <= keep_n:
            break
        next_n = max(keep_n, int(n_prunable * shrink))
        prunable = sorted(
            ((p, lp) for p, lp in logp.items() if p not in atoms),
            key=lambda kv: (-kv[1], kv[0]),
        )
        atom_probs = {a: logp[a] for a in atoms if a in logp}
        logp = dict(prunable[:next_n])
        logp.update(atom_probs)
    segs = {w: U._viterbi(w, logp, max_len) for w in freq}
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0])), segs


TEXTS = [
    "internationalization and internationalism are international",
    "the nation and the national internationals",
    "nationalism nationalized the international nation",
    "intern interns internal internally",
]


def test_viterbi_prefers_known_pieces():
    lp = {"in": -1.0, "tern": -1.2, "i": -5.0, "n": -5.0, "t": -5.0,
          "e": -5.0, "r": -5.0}
    assert U._viterbi("intern", lp, 8) == ["in", "tern"]
    # unsegmentable text falls back to atoms
    assert U._viterbi("xyz", lp, 8) == ["x", "y", "z"]


def test_unigram_train_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    stats = {}
    pieces, segmented = U.unigram_train(
        df,
        vocab_size=24,
        seed_size=40,
        max_piece_len=6,
        em_iters=2,
        shrink_factor=0.7,
        stats=stats,
    )
    ref_pieces, ref_segs = ref_train(TEXTS, 24, 40, 6, 2, 0.7)
    assert [p for p, _ in pieces] == [p for p, _ in ref_pieces]
    for (p, lp), (rp, rlp) in zip(pieces, ref_pieces):
        assert abs(lp - rlp) <= 1e-9 * max(1.0, abs(rlp)), p
    got = {r.word: list(r.toks) for r in segmented.collect()}
    assert got == ref_segs
    # multi-char pieces actually survived (the model learned units)
    assert any(len(p) > 1 for p, _ in pieces)
    assert stats["rounds"] >= 2


def test_unigram_train_deterministic_under_repartition(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    p1, _ = U.unigram_train(df, vocab_size=20, seed_size=30,
                            max_piece_len=5)
    p2, _ = U.unigram_train(df.repartition(7), vocab_size=20,
                            seed_size=30, max_piece_len=5)
    assert p1 == p2


def test_unigram_apply_counts(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    _, segmented = U.unigram_train(
        df, vocab_size=24, seed_size=40, max_piece_len=6
    )
    seg_map = {r.word: list(r.toks) for r in segmented.collect()}
    out = {
        r.doc_id: r.n_unigram_tokens
        for r in U.unigram_apply(df, segmented, ["doc_id"]).collect()
    }
    for i, t in enumerate(TEXTS):
        want = sum(len(seg_map[w]) for w in t.split() if w)
        assert out[i] == want, i
    # unseen words fall back to character count
    df2 = spark.createDataFrame([(9, "zz qqq")], "doc_id long, text string")
    assert U.unigram_apply(df2, segmented, ["doc_id"]).collect()[0][1] == 5


def test_unigram_pieces_save_load_and_segment(spark, tmp_path):
    """train -> save -> load -> viterbi_segment_table on a NEW corpus
    matches in-memory segmentation exactly (checkpoint workflow)."""
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    pieces, segmented = U.unigram_train(
        df, vocab_size=24, seed_size=40, max_piece_len=6
    )
    path = str(tmp_path / "pieces.parquet")
    U.save_pieces(pieces, spark, path)
    loaded = U.load_pieces(spark, path)
    assert loaded == pieces  # doubles round-trip parquet exactly
    # segment the training corpus through the checkpoint: must equal
    # the trainer's own final segmentation
    seg = {
        r.word: list(r.toks)
        for r in U.viterbi_segment_table(
            df, loaded, max_piece_len=6
        ).collect()
    }
    want = {r.word: list(r.toks) for r in segmented.collect()}
    assert seg == want
    # a NEW corpus with unseen words still segments (atom fallback)
    df2 = spark.createDataFrame([("internship xyz",)], "text string")
    seg2 = {
        r.word: list(r.toks)
        for r in U.viterbi_segment_table(
            df2, loaded, max_piece_len=6
        ).collect()
    }
    assert "".join(seg2["internship"]) == "internship"
    assert seg2["xyz"] == U._viterbi("xyz", dict(loaded), 6)


def test_unigram_train_rejects_bad_shrink_factor(spark):
    import pytest

    import hadron_spark.llm.unigram as U

    df = spark.createDataFrame([("a b",)], "text string")
    for bad in (1.0, 1.5, 0.0, -0.1):
        with pytest.raises(ValueError, match="shrink_factor"):
            U.unigram_train(df, vocab_size=4, shrink_factor=bad)
