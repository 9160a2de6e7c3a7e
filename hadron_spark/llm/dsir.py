"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick pretraining documents from a huge raw corpus
so their distribution matches a small high-quality TARGET corpus
(Wikipedia, textbooks), without training a model.

Mechanics, re-expressed Spark-first:

1. FEATURES — hashed bag of word uni+bigrams per document
   (`hashed_ngram_features`): tokenize → n-gram explode →
   crc32-bucket → (id, bucket, cnt).  crc32, not md5: the bucket
   hash runs once per gram occurrence (billions at corpus scale),
   crc32 is ~10× cheaper than md5+hex-conv, it is equally
   deterministic/re-shard-stable (a fixed public algorithm), and it
   stays test-mirrorable via Python's `zlib.crc32`.  Feature
   hashing needs no cryptographic spread — collisions are part of
   the model (Weinberger et al. 2009).  The wordcount shuffle
   shape; everything after is bounded by `n_buckets`, not corpus
   size.
2. BUCKET MODEL — add-one-smoothed unigram distributions over the
   hashed buckets for target (p̂) and raw (q̂), and the per-bucket
   log importance ratio  lr_b = ln p̂_b − ln q̂_b
   (`bucket_log_ratio`): two B-row aggregations + two scalar
   totals; the ratio table is broadcast everywhere downstream.
3. SCORES — log w(x) = Σ_b c_b(x)·lr_b per raw document
   (`dsir_scores`): one broadcast join + per-doc partial-agg'd sum.
4. RESAMPLE — Gumbel-top-k (`dsir_resample`): sampling k docs
   without replacement with probability ∝ w(x)^(1/temperature) is
   exactly taking the top-k of  log w/τ + Gumbel(0,1)  (Yellott
   1977 / the standard Gumbel-max generalization).  The Gumbel
   noise is a PURE FUNCTION of the doc key (md5 → uniform →
   −ln(−ln u)): no RNG state, identical under any partitioning or
   re-sharding — the `upsample_repeats` determinism discipline.
   Top-k itself is orderBy+limit = TakeOrderedAndProject
   (per-partition heaps, no single-partition funnel).

No SQL oracle: ln() is not correctly-rounded-guaranteed across
engines (unlike sqrt), so scores can differ in the last ulp between
Spark and DuckDB; the registry entries are rows-only and the math is
pinned against a pure-Python/numpy reference in test_dsir instead.

Scale: the raw corpus is tokenized ONCE — its feature table feeds
both the ratio fit and the score join and is pinned (ops.pin) so
the fan-out can't re-derive it; shuffles are the n-gram wordcount
exchange and a (doc, bucket) partial-agg'd sum.  The bucket model
is O(n_buckets) rows on the driver-free path — only the TOTALS
(two scalars) are collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadron_spark.functions.text import ngrams, tokenize


def hashed_ngram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    ngram_sizes: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """(id_col, bucket, cnt) — hashed word-n-gram bag per document.

    One narrow pass: tokenize, build every requested n-gram order
    inside the row (array concat — no per-order scans), explode,
    crc32-bucket (see module docstring), and partial-agg count per
    (doc, bucket).  The only shuffle is the (doc, bucket)
    aggregation, bounded by documents × distinct-buckets-per-doc."""
    toks = tokenize(F.col(text_col))
    grams = None
    for n in ngram_sizes:
        g = toks if n == 1 else ngrams(toks, n)
        grams = g if grams is None else F.concat(grams, g)
    bucket = F.crc32(F.col("_g").cast("binary")) % n_buckets
    return (
        df.select(F.col(id_col), F.explode(grams).alias("_g"))
        .select(id_col, bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bucket_log_ratio(
    target_feats: DataFrame,
    raw_feats: DataFrame,
    n_buckets: int = 10_000,
) -> DataFrame:
    """(bucket, lr) — add-one-smoothed log importance ratio per
    hashed bucket:  lr_b = ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B)).

    Built from a full outer join of the two B-bounded bucket-count
    tables (buckets unseen in either corpus contribute the smoothing
    floor and are representable by absence downstream — any bucket
    appearing in a scored document appears in the raw counts by
    construction).  Totals T and R are two collected scalars (the
    kmeans-centroid driver contract)."""
    from hadron_spark.operators.ops import pin

    # each count table feeds BOTH its total-scalar job and the outer
    # join; pinned (B-bounded rows) so the upstream feature pass runs
    # once per corpus, not once per consumer
    tc = pin(target_feats.groupBy("bucket").agg(F.sum("cnt").alias("t")))
    rc = pin(raw_feats.groupBy("bucket").agg(F.sum("cnt").alias("r")))
    totals_t = tc.agg(F.sum("t")).first()[0] or 0
    totals_r = rc.agg(F.sum("r")).first()[0] or 0
    denom_t = float(totals_t + n_buckets)
    denom_r = float(totals_r + n_buckets)
    both = (
        tc.join(rc, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce(F.col("t"), F.lit(0)).alias("t"),
            F.coalesce(F.col("r"), F.lit(0)).alias("r"),
        )
    )
    lr = (
        F.log((F.col("t") + 1).cast("double") / F.lit(denom_t))
        - F.log((F.col("r") + 1).cast("double") / F.lit(denom_r))
    )
    return both.select("bucket", lr.alias("lr"))


def dsir_scores(
    raw_df: DataFrame,
    target_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    ngram_sizes: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """(id_col, logw) — log importance weight of every raw document
    under the hashed-n-gram bucket model fit on (target, raw).

    The raw feature table feeds BOTH the bucket-ratio fit and the
    score join — pinned (ops.pin) so the corpus tokenize+explode
    pass runs exactly once (the fan-out materialization rule; at
    100 TB an unpinned fan-out is a second full corpus scan)."""
    from hadron_spark.operators.ops import pin

    raw_feats = pin(
        hashed_ngram_features(
            raw_df, id_col, text_col, n_buckets, ngram_sizes
        )
    )
    target_feats = hashed_ngram_features(
        target_df, id_col, text_col, n_buckets, ngram_sizes
    )
    lr = bucket_log_ratio(target_feats, raw_feats, n_buckets)
    return (
        raw_feats.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("lr")).alias("logw"))
    )


def gumbel_noise(key: Column, salt: str = "dsir") -> Column:
    """Deterministic standard-Gumbel draw as a pure function of the
    key: u = (md5-derived 60-bit integer + 0.5) / 2^60 ∈ (0,1), then
    −ln(−ln u).  Salted so independent resampling passes decorrelate.
    RNG-free: identical on any partitioning, cluster size, or rerun
    (the `hash_bucket` reproducibility contract extended to a
    continuous uniform)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(key.cast("string"), F.lit("/" + salt)).cast("binary")),
            1,
            15,
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 60))
    return -F.log(-F.log(u))


def dsir_resample(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    ngram_sizes: tuple[int, ...] = (1, 2),
    temperature: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """Select k raw documents, sampled without replacement with
    probability ∝ w(x)^(1/temperature), deterministically (Gumbel
    top-k with hash-derived noise).  temperature→0 approaches pure
    top-k by importance weight; 1.0 is faithful DSIR sampling.
    Output: the selected raw rows + (logw, gumbel_key) audit columns.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    scores = dsir_scores(
        raw_df, target_df, id_col, text_col, n_buckets, ngram_sizes
    )
    keyed = scores.withColumn(
        "gumbel_key",
        F.col("logw") / F.lit(float(temperature))
        + gumbel_noise(F.col(id_col), salt),
    )
    picked = keyed.orderBy(F.col("gumbel_key").desc(), F.col(id_col)).limit(k)
    return raw_df.join(picked, id_col)
