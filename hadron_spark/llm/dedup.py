"""Deduplication operators over a document corpus.

Exact dedup is a hash-groupBy; near-dup families use
signature → band → bucket-join candidate generation so the pairwise
comparison never goes n² — the only joins are equi-joins on bucket
keys, which shuffle-partition cleanly at 100 TB (MinHash/LSH per
Broder 1997; SimHash per Charikar 2002 — see PAPERS.md).

Determinism: every hash is a Catalyst expression (md5 / xxhash64)
so signatures are reproducible across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadron_spark.functions.text import char_shingles, ngrams, tokenize


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical texts by md5; keeper = min id. Output one row
    per distinct text: (text_hash, keeper_id, n_copies). One shuffle
    with map-side partial agg."""
    return (
        df.withColumn("text_hash", F.md5(F.col(text_col).cast("binary")))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row per distinct text (deterministic winner =
    lowest id, the reference's firstBy semantics
    Controller.hs:1257-1274)."""
    w = Window.partitionBy(F.md5(F.col(text_col).cast("binary"))).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_k: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """`sig: array<bigint>` per id — MinHash over character
    k-shingles. Returns (id_col, sig).

    Permutation family: xxhash64(shingle, seed=i) for i in 0..n-1;
    min per seed. Plan shape: shingles hashed to longs once (one
    higher-order transform), EXPLODED, then the n mins computed as a
    single codegen'd hash aggregate — min() over xxhash64(long, seed)
    stays inside whole-stage codegen, and map-side partial
    aggregation shrinks the shuffle to |docs|·n longs. (The
    expression-only alternative — n array_min/transform passes — runs
    ~8× slower because higher-order lambdas are interpreted per
    element, outside codegen.)"""
    sh = char_shingles(F.col(text_col), shingle_k)
    exploded = df.select(
        id_col, F.explode(F.transform(sh, lambda s: F.xxhash64(s))).alias("_h")
    )
    mins = exploded.groupBy(id_col).agg(
        *[F.min(F.xxhash64("_h", F.lit(i))).alias(f"_m{i}") for i in range(num_hashes)]
    )
    return mins.select(
        id_col, F.array(*[f"_m{i}" for i in range(num_hashes)]).alias("sig")
    )


def _drop_oversized_buckets(banded: DataFrame, keys: list[str], max_bucket_size: int) -> DataFrame:
    """Skew guard: LSH buckets larger than `max_bucket_size` are
    degenerate (boilerplate/empty-text clusters) and would go
    quadratic inside the self-join — drop them. The oversized-bucket
    list is tiny, so it broadcasts. Standard practice in web-scale
    dedup pipelines; at 100 TB this guard is what keeps the
    worst-case bounded at (max_bucket_size² / 2) per bucket."""
    big = (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_bucket_size)
        .select(*keys)
    )
    return banded.join(F.broadcast(big), on=keys, how="left_anti")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    max_bucket_size: int | None = 500,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) that collide in ≥1 LSH
    band, with their estimated Jaccard (= fraction of matching
    signature components).

    Plan shape: signature agg → explode to `bands` rows per doc →
    oversized-bucket guard → band-key equi-self-join → distinct
    pairs. The shuffle key is the band hash; degenerate buckets
    (boilerplate/empty text) are dropped by the guard, bounding the
    self-join at max_bucket_size² per bucket."""
    rows_per_band = num_hashes // bands
    sigged = minhash_signature(df, text_col, num_hashes, shingle_k, id_col).select(
        F.col(id_col).alias("_id"), "sig"
    )
    banded = sigged.select(
        "_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[b * rows_per_band + r]
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("_id", "sig", "bs.band", "bs.bkey")

    if max_bucket_size:
        banded = _drop_oversized_buckets(banded, ["band", "bkey"], max_bucket_size)

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bkey") == F.col("b.bkey"),
                F.col("a._id") < F.col("b._id"),
            ],
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda m: m,
        )
    ).cast("double") / F.lit(num_hashes)
    return pairs.select("id_a", "id_b", est.alias("est_jaccard"))


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    **kw,
) -> DataFrame:
    """Drop near-duplicates: any doc matched (est_jaccard ≥ threshold)
    with a lower-id doc is removed. Single-link union is approximated
    by one anti-join round (sufficient when dup clusters are pairs /
    stars, the common crawl-dedup case; run to fixpoint for chains)."""
    pairs = minhash_lsh_pairs(df, id_col, text_col, **kw).filter(
        F.col("est_jaccard") >= threshold
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame, text_col: str = "text", bits: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """`simhash: bigint` per id — Charikar fingerprint over word
    1-grams: for each bit b, sign(Σ_tokens ±1) where the ± is bit b
    of xxhash64(token). Returns (id_col, simhash).

    Plan shape: tokens hashed to longs (one higher-order transform),
    EXPLODED, then the per-bit votes are `bits` codegen'd SUM
    aggregates with map-side partial agg — same rationale as
    minhash_signature (interpreted HOF folds are ~5× slower).
    Token-less documents have no fingerprint (absent from output)."""
    toks = tokenize(F.col(text_col))
    exploded = df.select(
        id_col, F.explode(F.transform(toks, lambda t: F.xxhash64(t))).alias("_h")
    )
    votes = exploded.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright("_h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_v{b}")
            for b in range(bits)
        ]
    )
    bit_cols = []
    for b in range(bits):
        vote = F.col(f"_v{b}")
        bit_cols.append(
            F.when(vote > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
            * F.lit(2 ** b).cast("long")
            if b < 63
            else F.when(vote > 0, F.lit(-(2 ** 63))).otherwise(F.lit(0).cast("long"))
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return votes.select(id_col, out.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
    max_bucket_size: int | None = 500,
) -> DataFrame:
    """Pairs within `max_hamming` bits: pigeonhole block-match — split
    the 64-bit hash into `blocks` chunks; a pair within distance d <
    blocks must agree on ≥1 chunk → equi-join per chunk, then exact
    hamming filter via bit_count(xor). Bucketed equi-join, never n²."""
    width = 64 // blocks
    h = simhash(df, text_col, id_col=id_col).select(
        F.col(id_col).alias("_id"), "simhash"
    )
    chunked = h.select(
        "_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("simhash", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("ckey"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("c"),
    ).select("_id", "simhash", "c.blk", "c.ckey")
    if max_bucket_size:
        chunked = _drop_oversized_buckets(chunked, ["blk", "ckey"], max_bucket_size)
    a, b = chunked.alias("a"), chunked.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            on=[
                F.col("a.blk") == F.col("b.blk"),
                F.col("a.ckey") == F.col("b.ckey"),
                F.col("a._id") < F.col("b._id"),
            ],
        )
        .filter(hamming <= max_hamming)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, on candidate pairs)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard for given (id_a, id_b) candidate
    pairs — the verification stage after LSH candidate generation.
    Joins the n-gram sets in (two equi-joins on id), computes
    |∩|/|∪| via array ops."""
    grams = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(ngrams(tokenize(F.col(text_col)), n)).alias("grams"),
    )
    out = (
        candidate_pairs.join(grams.withColumnRenamed("_id", "id_a").withColumnRenamed("grams", "ga"), "id_a")
        .join(grams.withColumnRenamed("_id", "id_b").withColumnRenamed("grams", "gb"), "id_b")
    )
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return out.select(
        "id_a",
        "id_b",
        F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)).alias(
            "jaccard"
        ),
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold, candidates from
    random-hyperplane LSH (sign-bucket on n_planes deterministic
    pseudo-random planes). Bucket equi-join → exact cosine filter."""
    from hadron_spark.llm.similarity import hyperplane_bucket
    from hadron_spark.functions.vectors import cosine_similarity

    dim = len(df.select(vec_col).first()[0])
    b = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    x, y = b.alias("x"), b.alias("y")
    cos = cosine_similarity(F.col("x._v"), F.col("y._v"))
    return (
        x.join(
            y,
            on=[
                F.col("x.bucket") == F.col("y.bucket"),
                F.col("x._id") < F.col("y._id"),
            ],
        )
        .select(
            F.col("x._id").alias("id_a"),
            F.col("y._id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
