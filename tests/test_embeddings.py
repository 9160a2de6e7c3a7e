"""PCA / Gram over embeddings (llm.embeddings): exact one-pass
moments and a same-data numpy reference for the eigensolve."""

from __future__ import annotations

import numpy as np
import pytest

from hadron_spark.llm import embeddings as E


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    X = np.array(
        [r.embedding for r in df.orderBy("vec_id").collect()], dtype=np.float64
    )
    return df, X


def test_gram_matrix_exact_vs_numpy(vecs):
    df, X = vecs
    Q = np.floor(X * E.DEFAULT_QUANT + 0.5).astype(np.int64)
    G = Q.T @ Q
    s = Q.sum(axis=0)
    got = {(r.i, r.j): r.g for r in E.gram_matrix(df).collect()}
    d = X.shape[1]
    assert got[(-1, -1)] == float(X.shape[0])
    for i in range(d):
        assert got[(i, -1)] == float(s[i])
    # every upper-triangle entry exact (int64 sums are bit-portable)
    for i in range(d):
        for j in range(i, d):
            assert got[(i, j)] == float(G[i, j]), (i, j)
    # exactly the expected row count: triangle + sums + count
    assert len(got) == d * (d + 1) // 2 + d + 1


def test_pca_fit_matches_numpy_reference(vecs):
    df, X = vecs
    Q = np.floor(X * E.DEFAULT_QUANT + 0.5) / E.DEFAULT_QUANT
    cov = np.cov(Q, rowvar=False)
    rv = np.sort(np.linalg.eigh(cov)[0])[::-1]
    mean, comps, vals = E.pca_fit(df, k=6)
    assert np.allclose(mean, Q.mean(axis=0), atol=1e-12)
    assert np.allclose(vals, rv[:6], rtol=1e-9, atol=1e-12)
    # components orthonormal, sign-canonicalized
    assert np.allclose(comps @ comps.T, np.eye(6), atol=1e-9)
    for r in range(6):
        m = np.argmax(np.abs(comps[r]))
        assert comps[r, m] > 0


def test_pca_project_variance_matches_eigenvalues(vecs):
    df, X = vecs
    mean, comps, vals = E.pca_fit(df, k=4)
    out = np.array(
        [r.pca for r in E.pca_project(df, mean, comps).select("pca").collect()]
    )
    # sample variance along each projected axis == eigenvalue
    # (up to the float32→double read noise of the raw projection —
    # the projection uses RAW components, the fit used quantized)
    var = out.var(axis=0, ddof=1)
    assert np.allclose(var, vals, rtol=1e-3)
    # projection is centered
    assert np.allclose(out.mean(axis=0), 0, atol=1e-4)


def test_explained_variance_frame(vecs):
    df, _ = vecs
    rows = E.pca_explained_variance(df, k=5).collect()
    assert len(rows) == 5
    ev = [r.eigenvalue for r in rows]
    assert ev == sorted(ev, reverse=True)
    cs = [r.cum_share for r in rows]
    assert all(0 < c <= 1 for c in cs) and cs == sorted(cs)


def test_semantic_dedup_plants_and_keeps(spark):
    import random

    from hadron_spark.llm.dedup import semantic_dedup

    rng = random.Random(7)
    rows = []
    # two well-separated gaussian blobs + exact-ish duplicates
    for i in range(60):
        center = 1.0 if i % 2 == 0 else -1.0
        v = [center + rng.gauss(0, 0.05) for _ in range(8)]
        rows.append((i, v))
    # planted near-duplicates of ids 0 and 1 (tiny perturbation)
    rows.append((100, [x + 1e-4 for x in rows[0][1]]))
    rows.append((101, [x - 1e-4 for x in rows[1][1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        df, k=2, iters=4, threshold=0.9999, max_cluster_size=1000
    ).collect()
    by_id = {r.vec_id: r for r in out}
    # every row accounted once
    assert len(out) == len(rows)
    # planted dups dropped, pointing at their lower-id originals
    assert not by_id[100].keep and by_id[100].dup_of == 0
    assert not by_id[101].keep and by_id[101].dup_of == 1
    # originals kept
    assert by_id[0].keep and by_id[0].dup_of is None
    assert by_id[1].keep and by_id[1].dup_of is None
    # at this threshold nothing else collapses
    assert sum(1 for r in out if not r.keep) == 2


def test_semantic_dedup_chain_greedy_vs_any_lower(spark):
    """Chain 0~1, 1~2, 0≁2 (unit vectors at 0°, 25°, 50°; threshold
    cos30°): greedy keeps 2 — its only duplicate (1) was itself
    dropped against keeper 0 — while the one-join any_lower screen
    over-deletes it. This is the exact scenario from the round-2
    advisory."""
    import math

    from hadron_spark.llm.dedup import semantic_dedup

    def unit(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    df = spark.createDataFrame(
        [(0, unit(0)), (1, unit(25)), (2, unit(50))],
        "vec_id long, embedding array<double>",
    )
    thr = math.cos(math.radians(30))
    greedy = {
        r.vec_id: r
        for r in semantic_dedup(
            df, k=1, iters=1, threshold=thr, resolve="greedy"
        ).collect()
    }
    assert greedy[0].keep and greedy[0].dup_of is None
    assert not greedy[1].keep and greedy[1].dup_of == 0
    assert greedy[2].keep and greedy[2].dup_of is None

    any_lower = {
        r.vec_id: r
        for r in semantic_dedup(
            df, k=1, iters=1, threshold=thr, resolve="any_lower"
        ).collect()
    }
    assert not any_lower[1].keep and any_lower[1].dup_of == 0
    assert not any_lower[2].keep and any_lower[2].dup_of == 1

    import pytest

    with pytest.raises(ValueError):
        semantic_dedup(df, resolve="nope")


def test_semantic_dedup_derived_k_fires_beyond_guard(spark):
    """Scale contract: with k unset, k is derived from
    target_cluster_rows, so a corpus much larger than
    k_fixed * max_cluster_size still gets examined (the round-2
    'silent no-op' trap). 400 rows, max_cluster_size=60: a fixed
    k=1 would drop its single 400-row cluster and keep everything;
    derived k ≈ 400/40 = 10 keeps clusters under the guard and the
    planted duplicate is found."""
    import random

    from hadron_spark.llm.dedup import semantic_dedup

    rng = random.Random(11)
    rows = []
    for i in range(400):
        c = float(i % 10)  # 10 well-separated blobs on a line
        rows.append(
            (i, [c * 10 + rng.gauss(0, 0.01), rng.gauss(0, 0.01), 1.0])
        )
    rows.append((1000, [x + 1e-6 for x in rows[3][1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        df,
        iters=4,
        threshold=0.999999,
        max_cluster_size=60,
        target_cluster_rows=40,
    ).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(out) == len(rows)
    assert not by_id[1000].keep and by_id[1000].dup_of == 3
    # fixed-k control: k=1 -> single oversized cluster -> silent keep-all
    ctl = semantic_dedup(
        df, k=1, iters=1, threshold=0.999999, max_cluster_size=60
    ).collect()
    assert all(r.keep for r in ctl)


def test_semantic_dedup_oversized_cluster_kept(spark):
    from hadron_spark.llm.dedup import semantic_dedup

    # identical vectors → one cluster larger than the guard: rows
    # must be KEPT (conservative), not exploded or dropped
    rows = [(i, [1.0] * 4) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, k=1, iters=1, threshold=0.5, max_cluster_size=5).collect()
    assert len(out) == 20
    assert all(r.keep for r in out)


def test_gram_matrix_mergeable_incremental(spark, vecs):
    """Gram partials are exactly additive: G(A) + G(B) == G(A∪B)
    entry-for-entry (int64 sums — bit-exact), so nightly embedding
    batches can maintain the covariance incrementally (the
    incremental_rollup discipline applied to second moments)."""
    df, _ = vecs
    a = df.filter("vec_id % 2 = 0")
    b = df.filter("vec_id % 2 = 1")
    ga = {(r.i, r.j): r.g for r in E.gram_matrix(a).collect()}
    gb = {(r.i, r.j): r.g for r in E.gram_matrix(b).collect()}
    gu = {(r.i, r.j): r.g for r in E.gram_matrix(df).collect()}
    assert set(ga) == set(gb) == set(gu)
    for key in gu:
        assert ga[key] + gb[key] == gu[key], key


def test_mahalanobis_matches_numpy_and_flags_planted_outlier(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(0, 1.0), rng.gauss(0, 0.5), rng.gauss(0, 0.1),
             rng.gauss(0, 0.05)])
        for i in range(300)
    ]
    rows.append((999, [8.0, -6.0, 2.0, 1.0]))  # far outlier
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r.score for r in E.mahalanobis_scores(df).collect()}
    # numpy reference on the same quantized data
    X = np.array([v for _, v in rows])
    Q = np.floor(X * E.DEFAULT_QUANT + 0.5) / E.DEFAULT_QUANT
    mu = Q.mean(axis=0)
    cov = np.cov(Q, rowvar=False)
    inv = np.linalg.inv(cov + 1e-9 * np.eye(4))
    # the op centers RAW vectors against the quantized-fit mean/cov
    for (vid, _), x in zip(rows, X):
        ref = float((x - mu) @ inv @ (x - mu))
        assert abs(got[vid] - ref) / max(ref, 1.0) < 1e-6, (vid, got[vid], ref)
    # the planted outlier dominates every inlier score
    inlier_max = max(v for k, v in got.items() if k != 999)
    assert got[999] > 10 * inlier_max


def test_ivf_append_visible_and_placed(spark, sf_dir, tmp_path):
    """Appended vectors are immediately searchable, land in the cell
    their own argmin picks (placement == probe rule), and the stats
    gauge counts them."""
    from pyspark.sql import functions as F

    from hadron_spark.llm.similarity import build_ivf_index, ivf_append, ivf_search

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") % 2 == 0)
    newer = emb.filter(F.col("vec_id") % 2 == 1).limit(40)
    idx = str(tmp_path / "ivf")
    build_ivf_index(base, idx, n_centroids=4, max_train_rows=10_000)
    st = ivf_append(spark, idx, newer)
    assert st["appended"] == 40 and 1 <= st["cells"] <= 4
    assert st["max_cell_fill"] <= 40
    # every appended id is in the stored layout exactly once, and
    # searches (which exclude self-matches by contract) see the new
    # rows: a base query's candidate pool now includes appended ids
    stored = spark.read.parquet(f"{idx}/cells.parquet")
    new_ids = {r["vec_id"] for r in newer.collect()}
    counts = {
        r["neighbor_id"]: r["n"]
        for r in stored.filter(F.col("neighbor_id").isin(list(new_ids)))
        .groupBy("neighbor_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) == new_ids and set(counts.values()) == {1}
    probe = base.limit(5)
    hits = ivf_search(spark, idx, probe, k=50, n_probe=4)
    assert hits.filter(F.col("neighbor_id").isin(list(new_ids))).count() > 0
