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
