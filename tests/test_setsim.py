"""Exact set-similarity join (prefix filtering) vs brute force."""

from __future__ import annotations

import itertools
import random

from hadron_spark.llm.dedup import set_similarity_join


def _brute(docs, num, den):
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(sorted(docs.items()), 2):
        sa, sb = set(ta), set(tb)
        inter = len(sa & sb)
        uni = len(sa | sb)
        if uni and inter * den >= uni * num:
            out[(ia, ib)] = (inter, uni)
    return out


def test_set_similarity_join_exact_vs_brute(spark):
    """Randomized corpus with heavy shared (frequent) vocabulary —
    the adversarial case for prefix filtering, which keeps only RARE
    tokens as candidates yet must stay lossless."""
    rng = random.Random(7)
    common = [f"c{i}" for i in range(8)]       # high-df tokens
    rare = [f"r{i}" for i in range(200)]       # low-df tokens
    docs = {}
    for i in range(60):
        docs[i] = rng.sample(common, rng.randint(3, 6)) + rng.sample(
            rare, rng.randint(1, 6)
        )
    # planted near-identical pair overlapping ONLY via frequent tokens
    docs[100] = ["c0", "c1", "c2", "c3"]
    docs[101] = ["c0", "c1", "c2", "c7"]
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, tokens array<string>"
    )
    for num, den in ((1, 2), (3, 5), (4, 5)):
        got = {
            (r["id_a"], r["id_b"]): (r["n_common"], r["n_union"])
            for r in set_similarity_join(
                df, threshold_num=num, threshold_den=den
            ).collect()
        }
        assert got == _brute(docs, num, den), (num, den)
    # the planted frequent-only pair survives at 3/5 (J = 3/5)
    got = {
        (r["id_a"], r["id_b"])
        for r in set_similarity_join(df, threshold_num=3, threshold_den=5).collect()
    }
    assert (100, 101) in got


def test_set_similarity_join_validates_and_handles_dups(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, ["a", "a", "b"]), (2, ["b", "a"]), (3, [])],
        "doc_id long, tokens array<string>",
    )
    with pytest.raises(ValueError):
        set_similarity_join(df, threshold_num=3, threshold_den=2)
    rows = set_similarity_join(df, threshold_num=1, threshold_den=1).collect()
    # duplicate tokens collapse; empty set never pairs; J(1,2)=1
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in rows] == [(1, 2, 1.0)]


def _lcs_naive(a, b):
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m):
        for j in range(n):
            dp[i + 1][j + 1] = (
                dp[i][j] + 1 if a[i] == b[j] else max(dp[i][j + 1], dp[i + 1][j])
            )
    return dp[m][n]


def test_rouge_l_matches_naive_reference(spark):
    from hadron_spark.llm.dedup import _lcs_len, rouge_l_decontaminate
    import numpy as np

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]
    docs = {i: " ".join(rng.choices(vocab, k=rng.randint(0, 18))) for i in range(40)}
    seeds = {100 + i: " ".join(rng.choices(vocab, k=rng.randint(3, 12))) for i in range(6)}
    for a in (["a", "b", "c"], [], ["x"] * 5):
        for b in (["b", "c", "d"], ["a"], []):
            assert _lcs_len(a, np.asarray(b, dtype=object)) == _lcs_naive(a, b)
    corpus = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    sdf = spark.createDataFrame(list(seeds.items()), "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in rouge_l_decontaminate(
            corpus.repartition(7), sdf, threshold_num=1, threshold_den=2
        ).collect()
    }
    for did, text in docs.items():
        c = text.lower().split()
        best = max(
            (
                (
                    2 * _lcs_naive(c, s.lower().split())
                    / (len(c) + len(s.split()))
                    if (len(c) + len(s.split()))
                    else 0.0,
                    sid,
                )
                for sid, s in seeds.items()
            ),
        )
        assert out[did]["max_rouge_l"] == best[0], did
        assert out[did]["top_seed_id"] == best[1], did
        assert out[did]["contaminated"] == (best[0] >= 0.5), did


def test_rouge_l_boundary_tiebreak_and_validation(spark):
    import pytest

    from hadron_spark.llm.dedup import rouge_l_decontaminate

    corpus = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, ""), (3, "a b c")],
        "doc_id long, text string",
    )
    # seed 200 and 201 both reach LCS 3 with doc 3 (identical seeds)
    seeds = spark.createDataFrame(
        [(200, "a b c"), (201, "a b c"), (202, "z z z z z z z z z z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in rouge_l_decontaminate(corpus, seeds).collect()}
    assert out[3]["top_seed_id"] == 201  # tie -> higher seed id
    assert out[3]["max_rouge_l"] == 1.0 and out[3]["contaminated"]
    # doc 1 vs seed 200: F = 2*3/(10+3) < 0.7 -> clean
    assert not out[1]["contaminated"]
    assert out[2]["max_rouge_l"] == 0.0 and not out[2]["contaminated"]
    with pytest.raises(ValueError):
        rouge_l_decontaminate(corpus, seeds.limit(0))


def test_set_similarity_hashed_equals_string_mode(spark):
    """xxhash64 token mode (the scale path) returns the identical
    pair set and counts as the bit-guaranteed string mode."""
    rng = random.Random(19)
    vocab = [f"t{i}" for i in range(300)]
    docs = {i: rng.sample(vocab, rng.randint(5, 40)) for i in range(80)}
    # plant near-dup clusters so the joins actually fire
    for i in range(0, 40, 4):
        docs[1000 + i] = docs[i] + [f"x{i}"]
        docs[2000 + i] = list(docs[i])
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, tokens array<string>"
    )
    key = lambda r: (r["id_a"], r["id_b"], r["n_common"], r["n_union"])  # noqa: E731
    hashed = sorted(
        map(key, set_similarity_join(df, threshold_num=1, threshold_den=2).collect())
    )
    plain = sorted(
        map(
            key,
            set_similarity_join(
                df, threshold_num=1, threshold_den=2, hash_tokens=False
            ).collect(),
        )
    )
    assert hashed == plain and len(hashed) > 0
