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
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    Plan: broadcast the query set (queries are the small side by
    construction) → every corpus partition scores its rows against
    all queries locally (no shuffle of the corpus) → one shuffle of
    k·|queries| candidate rows for the window. Self-matches excluded.
    Rank ties broken by neighbor id for determinism."""
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
