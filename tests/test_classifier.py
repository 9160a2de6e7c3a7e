"""Logistic quality classifier (llm.classifier): distributed GD
training pinned against a numpy reference, exp-free application."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hadron_spark.llm import classifier as C

GOOD = [
    "the cat sat on the mat and it was happy to be in the sun",
    "a quick brown fox jumps over the lazy dog in the park",
    "this is a short story about the sea and the sky at dawn",
    "it was the best of times and it was the worst of times",
    "we walked to the market in the morning for bread and tea",
]
BAD = [
    "x9f3 zz91 q0qq 77a1 b2c3 d4e5 f6g7 h8i9",
    "$$$ ### @@@ 123456789 000000 111111 999",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa 42",
    "01 23 45 67 89 01 23 45 67 89 01 23",
    "qqqqqq wwwwww eeeeee rrrrrr 555555",
]


def _labeled(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(BAD)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def py_features(text: str) -> list[float]:
    toks = [t for t in text.split() if t]
    nt = max(len(toks), 1)
    tok_chars = sum(len(t) for t in toks)
    stop = sum(1 for t in toks if t.lower() in C.STOPWORDS)
    nc = max(len(text), 1)
    digits = sum(1 for ch in text if ch.isdigit() and ch.isascii())
    return [
        tok_chars / nt,
        stop / nt,
        min(len(toks), 1000) / 1000,
        digits / nc,
    ]


def py_train(rows, lr=1.0, iters=100):
    """Mirror of train_quality_classifier: GD in STANDARDIZED feature
    space, weights de-standardized at the end."""
    raw = [(py_features(t), y) for t, y in rows]
    n = len(raw)
    d = 4
    mu = [sum(f[j] for f, _ in raw) / n for j in range(d)]
    sd = []
    for j in range(d):
        v = sum((f[j] - mu[j]) ** 2 for f, _ in raw) / n
        s = math.sqrt(v)
        sd.append(s if s > 0 else 1.0)
    feats = [
        ([(f[j] - mu[j]) / sd[j] for j in range(d)], y) for f, y in raw
    ]
    w = [0.0] * (d + 1)  # bias + d features
    for _ in range(iters):
        g = [0.0] * (d + 1)
        for f, y in feats:
            z = w[0] + sum(wi * fi for wi, fi in zip(w[1:], f))
            p = 1.0 / (1.0 + math.exp(-z))
            e = p - y
            g[0] += e
            for j, fj in enumerate(f):
                g[j + 1] += e * fj
        w = [wi - lr * gi / n for wi, gi in zip(w, g)]
    out = [w[0] - sum(w[j + 1] * mu[j] / sd[j] for j in range(d))]
    out += [w[j + 1] / sd[j] for j in range(d)]
    return out


def test_features_match_reference(spark):
    df = _labeled(spark)
    got = {r.doc_id: r for r in C.featurize(df).collect()}
    for r in df.select("doc_id", "text").collect():
        want = py_features(r.text)
        have = [got[r.doc_id][n] for n in C.FEATURE_NAMES]
        assert all(abs(a - b) < 1e-12 for a, b in zip(have, want)), r.doc_id


def test_train_matches_numpy_reference_and_separates(spark):
    df = _labeled(spark)
    w = C.train_quality_classifier(df, "y", iters=60)
    rows = [(r.text, r.y) for r in df.select("text", "y").collect()]
    want = py_train(rows, iters=60)
    got = [w["bias"]] + [w[n] for n in C.FEATURE_NAMES]
    for a, b in zip(got, want):
        assert abs(a - b) <= 1e-6 * max(1.0, abs(b)), (got, want)
    # the trained model must separate the planted fixture perfectly
    out = {r.doc_id: r.keep for r in C.apply_quality_classifier(df, w).collect()}
    assert all(out[i] for i in range(len(GOOD)))
    assert not any(out[100 + i] for i in range(len(BAD)))


def test_apply_is_exp_free_and_thresholds_logit(spark):
    df = _labeled(spark)
    w = {
        "bias": -2.0,
        "mean_token_len": 0.35,
        "stop_frac": 4.0,
        "len_feat": 1.5,
        "digit_frac": -3.0,
    }
    out = C.apply_quality_classifier(df, w, z_threshold=0.0)
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "exp(" not in plan  # regexp_replace is fine; EXP() is not
    rows = {r.doc_id: r for r in out.collect()}
    for r in df.select("doc_id", "text").collect():
        f = py_features(r.text)
        z = (
            w["bias"]
            + f[0] * w["mean_token_len"]
            + f[1] * w["stop_frac"]
            + f[2] * w["len_feat"]
            + f[3] * w["digit_frac"]
        )
        assert abs(rows[r.doc_id].z - z) < 1e-12
        assert rows[r.doc_id].keep == (z >= 0.0)


def test_train_rejects_empty(spark):
    import pytest

    df = spark.createDataFrame([], "doc_id long, text string, y int")
    with pytest.raises(ValueError):
        C.train_quality_classifier(df, "y", iters=1)
