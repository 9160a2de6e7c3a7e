"""DSIR importance resampling (llm.dsir) pinned against a pure-Python
reference of the hashed-n-gram bucket model (arXiv:2302.03169)."""

from __future__ import annotations

import hashlib
import math
import zlib
from collections import Counter

from pyspark.sql import functions as F

from hadron_spark.llm import dsir

B = 64  # small bucket space so collisions are exercised


def py_bucket(gram: str, n_buckets: int = B) -> int:
    # mirrors the engine's crc32 bucket (zlib.crc32 IS CRC-32/ISO-HDLC)
    return zlib.crc32(gram.encode()) % n_buckets


def py_features(text: str, n_buckets: int = B) -> Counter:
    toks = [t for t in text.split() if t]
    grams = toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    return Counter(py_bucket(g, n_buckets) for g in grams)


def py_scores(raw: dict, target: dict, n_buckets: int = B) -> dict:
    tc, rc = Counter(), Counter()
    for t in target.values():
        tc.update(py_features(t, n_buckets))
    feats = {i: py_features(t, n_buckets) for i, t in raw.items()}
    for f in feats.values():
        rc.update(f)
    T, R = sum(tc.values()), sum(rc.values())
    lr = {
        b: math.log((tc[b] + 1) / (T + n_buckets))
        - math.log((rc[b] + 1) / (R + n_buckets))
        for b in set(tc) | set(rc)
    }
    return {
        i: sum(c * lr[b] for b, c in f.items()) for i, f in feats.items()
    }


def py_gumbel(key, salt="dsir") -> float:
    h = int(hashlib.md5(f"{key}/{salt}".encode()).hexdigest()[:15], 16)
    u = (h + 0.5) / float(1 << 60)
    return -math.log(-math.log(u))


RAW = {
    0: "the cat sat on the mat",
    1: "quantum energy states decay rapidly",
    2: "the dog ate the homework",
    3: "energy levels of quantum fields",
    4: "buy cheap pills now click here",
    5: "quantum decay of excited energy states",
    6: "click here buy now cheap cheap",
    7: "the mat sat on the cat",
}
TARGET = {
    100: "quantum energy fields and decay",
    101: "excited quantum states and energy levels",
}


def _frames(spark):
    raw = spark.createDataFrame(
        [(i, t) for i, t in RAW.items()], "doc_id long, text string"
    )
    tgt = spark.createDataFrame(
        [(i, t) for i, t in TARGET.items()], "doc_id long, text string"
    )
    return raw, tgt


def test_hashed_features_match_reference(spark):
    raw, _ = _frames(spark)
    got = {}
    for r in dsir.hashed_ngram_features(raw, n_buckets=B).collect():
        got.setdefault(r.doc_id, Counter())[r.bucket] = r.cnt
    for i, t in RAW.items():
        assert got[i] == py_features(t), i


def test_dsir_scores_match_reference(spark):
    raw, tgt = _frames(spark)
    want = py_scores(RAW, TARGET)
    got = {
        r.doc_id: r.logw
        for r in dsir.dsir_scores(raw, tgt, n_buckets=B).collect()
    }
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) <= 1e-9 * max(1.0, abs(want[i])), i


def test_gumbel_noise_matches_reference(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    got = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", dsir.gumbel_noise(F.col("doc_id")).alias("g")
        ).collect()
    }
    for i in range(20):
        assert abs(got[i] - py_gumbel(i)) <= 1e-12 * max(1.0, abs(py_gumbel(i)))


def test_resample_prefers_target_like_and_is_deterministic(spark):
    raw, tgt = _frames(spark)
    # near-argmax temperature: importance dominates the noise
    picked = dsir.dsir_resample(
        raw, tgt, k=3, n_buckets=B, temperature=0.01
    )
    ids = sorted(r.doc_id for r in picked.collect())
    # the three quantum/energy docs are the target-like ones
    assert ids == [1, 3, 5]
    assert set(picked.columns) >= {"doc_id", "text", "logw", "gumbel_key"}
    # identical selection under a different partitioning (RNG-free)
    ids2 = sorted(
        r.doc_id
        for r in dsir.dsir_resample(
            raw.repartition(7), tgt, k=3, n_buckets=B, temperature=0.01
        ).collect()
    )
    assert ids2 == ids
    # faithful-sampling path matches the reference Gumbel-top-k
    want_keys = {
        i: py_scores(RAW, TARGET)[i] / 1.0 + py_gumbel(i) for i in RAW
    }
    want_top = sorted(sorted(want_keys, key=want_keys.get, reverse=True)[:4])
    got_top = sorted(
        r.doc_id
        for r in dsir.dsir_resample(
            raw, tgt, k=4, n_buckets=B, temperature=1.0
        ).collect()
    )
    assert got_top == want_top


def test_resample_validates_temperature(spark):
    import pytest

    raw, tgt = _frames(spark)
    with pytest.raises(ValueError):
        dsir.dsir_resample(raw, tgt, k=1, temperature=0.0)
