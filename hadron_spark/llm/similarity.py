"""Similarity search over an embedding column (array<float>).

Two tiers:
- brute_force_topk — exact cosine top-k: broadcast the (small) query
  set against the full corpus; per-row score is a codegen'd
  expression, top-k per query via window. Correct baseline at any
  corpus size (scales linearly, one pass).
- lsh_topk — random-hyperplane LSH bucketing: queries only compare
  against corpus rows sharing a bucket (with optional multi-probe),
  turning the scan into a bucket equi-join. The 100 TB path.

An IVF variant (k-means coarse quantizer) is a natural next tier; the
hyperplane LSH keeps everything expression-level and deterministic.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hadron_spark.functions.vectors import cosine_similarity


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (driver-side tiny
    constant, shipped in the plan as literals)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def hyperplane_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Sign-pattern bucket id (0..2^n_planes-1) of `vec` against the
    deterministic plane set — a pure expression (no UDF)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(_planes(dim, n_planes, seed)):
        d = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(p) for p in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend: str = "expr",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    Plan: broadcast the query set (queries are the small side by
    construction) → every corpus partition scores its rows against
    all queries locally (no shuffle of the corpus) → one shuffle of
    k·|queries| candidate rows for the window. Self-matches excluded.
    Rank ties broken by neighbor id for determinism.

    backend="expr" (default) scores with the codegen'd JVM
    expression; backend="pandas" routes through the Arrow-vectorized
    numpy matmul scorer (functions.vectors.cosine_matrix_pandas) —
    faster at large dim × |queries|, but its pairwise FP summation is
    not bit-identical to the fold, so use it for ranking, not for
    oracle-hashed score values."""
    if backend == "pandas":
        from hadron_spark.functions.vectors import cosine_matrix_pandas

        qrows = [
            (r["query_id"], list(map(float, r["qvec"])))
            for r in queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("qvec"),
            ).collect()
        ]
        scorer = cosine_matrix_pandas(qrows)
        scored = (
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.explode(scorer(F.col(vec_col).cast("array<double>"))).alias("s"),
            )
            .select(
                F.col("s.query_id").alias("query_id"),
                "neighbor_id",
                F.col("s.score").alias("cosine"),
            )
            .filter(F.col("neighbor_id") != F.col("query_id"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("cvec"), F.col("qvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    max_train_rows: int = 100_000,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer → corpus
    partitioned by nearest centroid → queries probe their `n_probe`
    nearest cells only.

    Scale path: training samples ≤ max_train_rows (driver-coordinated
    k-means over a bounded sample); cell assignment is one JVM-side
    model.transform pass; the search is a centroid-cell equi-join —
    compare cost drops by ~n_centroids/n_probe vs brute force, and
    the join partitions cleanly. Recall is tunable via n_probe."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    fc = F.col(vec_col).cast("array<double>")
    corpus_feat = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        array_to_vector(fc).alias("features"),
    )
    n_rows = corpus_feat.count()
    train = (
        corpus_feat.sample(fraction=min(1.0, max_train_rows / max(n_rows, 1)), seed=seed)
        if n_rows > max_train_rows
        else corpus_feat
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=10).fit(train)
    assigned = model.transform(corpus_feat).select(
        "neighbor_id", "cvec", F.col("prediction").alias("cell")
    )

    # query-side probes: distance to every centroid as an expression
    # over the (tiny, literal) centroid matrix → top n_probe cells
    centers = [list(map(float, c)) for c in model.clusterCenters()]

    def sq_dist(vec, center):
        return F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in center]),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dists = F.array(
        *[
            F.struct(sq_dist(F.col(vec_col), c).alias("d"), F.lit(i).alias("cell"))
            for i, c in enumerate(centers)
        ]
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.explode(
                F.transform(
                    F.slice(F.array_sort(dists), 1, n_probe), lambda s: s["cell"]
                )
            ).alias("cell"),
        )
    )
    scored = (
        assigned.join(q, on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("cvec"), F.col("qvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate cosine top-k via hyperplane-LSH buckets.

    NOT the default approximate tier — `ivf_topk` is. Measured on the
    driver fixtures (RECALL.md): sign-LSH recall@10 is 0.07–0.12 on
    i.i.d.-noise embeddings (its theoretical worst case — recall
    degenerates to the probed corpus fraction) vs IVF's 0.88, and on
    CLUSTERED fixtures (real embedding distributions) LSH recovers
    because same-bucket probability concentrates on true neighbors.
    Reach for LSH when the corpus is strongly clustered AND the
    one-time k-means pass of IVF is unaffordable; otherwise use IVF.

    Corpus is bucketed once (narrow); queries probe their own bucket
    plus `multiprobe` single-bit-flip neighbors (recall knob). The
    compare set shrinks by ~2^n_planes; the join is a plain bucket
    equi-join that partitions cleanly at scale."""
    dim = len(corpus.select(vec_col).first()[0])
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes, seed).alias("bucket0"),
    )
    probes = [F.col("bucket0")] + [
        F.col("bucket0").bitwiseXOR(F.lit(1 << i)) for i in range(multiprobe)
    ]
    q = F.broadcast(
        qb.select(
            "query_id", "qvec", F.explode(F.array(*probes)).alias("bucket")
        )
    )
    scored = (
        c.join(q, on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("cvec"), F.col("qvec")).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column:
    (id, cluster, sq_dist). Deterministic init (first k vectors by
    id).

    Scale contract: the DATA never reaches the driver — assignment is
    a codegen'd expression scoring each row against k centroid
    literals (centroids are MODEL STATE, k·dim floats, the one thing
    that legitimately rides the driver loop, exactly like PageRank's
    per-round ranks stay distributed while the loop counter doesn't).
    Per iteration: one narrow assignment pass + one groupBy(cluster)
    mean — the posexplode path aggregates (cluster, dim) cells so the
    centroid update is a |k·dim|-row result, partial-agg'd map-side.
    """
    centroids = [
        [float(x) for x in r[vec_col]]
        for r in df.orderBy(id_col).limit(k).collect()
    ]

    def dist_expr(c: list[float]) -> str:
        lit = "array(" + ",".join(f"{x!r}D" for x in c) + ")"
        return (
            f"aggregate(zip_with({vec_col}, {lit}, (x, y) -> "
            "(double(x) - y) * (double(x) - y)), 0D, (a, x) -> a + x)"
        )

    assigned = None
    for _ in range(iters):
        dists = "array(" + ",".join(dist_expr(c) for c in centroids) + ")"
        assigned = df.selectExpr(
            f"{id_col}",
            f"{vec_col}",
            f"array_min({dists}) as sq_dist",
            # array_position is 1-based; ties break to the lowest
            # cluster id (position of the first minimum)
            f"int(array_position({dists}, array_min({dists})) - 1) as cluster",
        )
        cells = assigned.select(
            "cluster", F.posexplode(vec_col).alias("pos", "x")
        )
        means = (
            cells.groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("s"))
            .select("cluster", F.col("s.m").alias("c"))
            .collect()
        )
        new_c = {r["cluster"]: [float(x) for x in r["c"]] for r in means}
        centroids = [new_c.get(i, centroids[i]) for i in range(k)]
    return assigned.select(id_col, "cluster", "sq_dist")
