"""Embedding-matrix analytics: exact distributed Gram/covariance and
PCA (principal component analysis) for embedding columns.

The moment computation every embedding pipeline needs — covariance
for PCA/whitening, the Gram matrix for spectral diagnostics — is a
d×d reduction over an n×d matrix: tiny output, full-corpus input.
The scale-right Spark shape is a one-pass Arrow-batched partial
reduction (`mapInPandas` + numpy `X.T @ X` per batch — the declared
Pandas-UDF escape hatch; no built-in expresses a matrix product
without exploding rows d× and shuffling them) followed by a
d(d+1)/2-row partial-sum shuffle. The corpus is never shuffled — only
per-batch d×d partials move, so the exchange is O(batches·d²)
regardless of corpus size.

Determinism contract (registry oracles hash values): components are
quantized to integer units via floor(x·quant + 0.5) — the same
engine-portable rounding `int8_quantize` uses — so every Gram entry
is a sum of exact int64 products, accumulated into DECIMAL(38,0)
(exact at any corpus size) and cast once to double (one
correctly-rounded int→double conversion, bit-identical in any
engine). Overflow bound: |x|<10 and quant=1e5 keep each product
≤ 1e12; partials are emitted PER ARROW BATCH (never accumulated
across batches in int64), so the int64 ceiling applies to one batch
(~9e6 rows at those bounds — two orders above `spark.sql.execution
.arrow.maxRecordsPerBatch`'s default 10k), not to a whole partition;
all cross-batch summation is DECIMAL(38,0), exact.

The eigendecomposition itself is O(d³) on d×d scalars — driver-side
numpy by construction (same contract as `similarity.kmeans`
centroids), then the projection returns to the engine as literal
component arrays inside one JVM expression per output column.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_QUANT = 100_000


def _quantize_np(X, quant: int):
    """Quantize a float matrix to int64 units — numpy mirror of the
    engine-portable floor(double(x)·quant + 0.5). float32→float64 is
    exact, double ops are IEEE — identical to the SQL form the
    oracle runs. Kept in numpy (not a JVM transform) so the Arrow
    transfer ships the raw float32 column: half the bytes and no
    per-element JVM lambda on the 100 TB side."""
    import numpy as np

    return np.floor(X.astype(np.float64) * quant + 0.5).astype(np.int64)


def gram_partials(
    df: DataFrame, vec_col: str = "embedding", quant: int = DEFAULT_QUANT
) -> DataFrame:
    """Exact-integer Gram statistic: (i int, j int, gx decimal(38,0)).
    The DECIMAL accumulator BEFORE the double cast — the form
    streaming state merges on, so repeated merges never round-trip
    through double (exact past 2^53 at any stream volume).
    `gram_matrix` is this plus one final double cast."""

    def part(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        # one partial frame PER ARROW BATCH — never accumulate across
        # batches in int64, so the documented overflow bound (|x|<10,
        # quant=1e5 -> products ≤1e12, int64 safe to ~9e6 rows) holds
        # per batch (maxRecordsPerBatch default 10k) rather than per
        # partition, where a 100 TB partition would silently wrap.
        # The d(d+1)/2-row-per-batch emission is exactly the
        # O(batches·d²) exchange the module contract states; exact
        # cross-batch summation happens shuffle-side in DECIMAL(38,0).
        for pdf in batches:
            if not len(pdf):
                continue
            X = _quantize_np(np.stack(pdf["_v"].to_numpy()), quant)
            if X.size == 0:
                continue
            g = X.T @ X
            s = X.sum(axis=0)
            n = X.shape[0]
            iu = [
                (i, j)
                for i in range(g.shape[0])
                for j in range(i, g.shape[1])
            ]
            yield pd.DataFrame(
                {
                    "i": [i for i, _ in iu] + list(range(len(s))) + [-1],
                    "j": [j for _, j in iu] + [-1] * len(s) + [-1],
                    "partial": [int(g[i, j]) for i, j in iu]
                    + [int(x) for x in s]
                    + [n],
                }
            )

    parts = df.select(F.col(vec_col).alias("_v")).mapInPandas(
        part, "i int, j int, partial long"
    )
    return parts.groupBy("i", "j").agg(
        F.sum(F.col("partial").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("gx")
    )


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", quant: int = DEFAULT_QUANT
) -> DataFrame:
    """Upper-triangle Gram matrix G[i,j] = Σ_rows v[i]·v[j] of the
    quantized embedding column, plus the column-sum vector as j=-1
    rows and the row count as (i,j)=(-1,-1) — everything `pca_fit`
    needs, from ONE pass over the corpus.

    Output: (i int, j int, g double) — d(d+1)/2 + d + 1 rows.
    g is exact: int64 batch partials → DECIMAL(38,0) sum → one
    correctly-rounded double cast."""
    return gram_partials(df, vec_col, quant).select(
        "i", "j", F.col("gx").cast("double").alias("g")
    )


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int | None = 8,
    quant: int = DEFAULT_QUANT,
):
    """Fit PCA on the embedding column: one distributed Gram pass,
    then an O(d³) driver-side eigendecomposition of the d×d sample
    covariance (the `kmeans`-style driver-coordination contract —
    only d² scalars ever reach the driver).

    Returns (mean, components, explained_var):
      mean            — length-d numpy vector (original float units)
      components      — k×d numpy matrix, rows = top-k eigenvectors
                        (sign-canonicalized: largest-|.| coordinate
                        positive, so results are reproducible across
                        LAPACK builds)
      explained_var   — length-k eigenvalues, descending."""
    import numpy as np

    rows = gram_matrix(df, vec_col, quant).collect()
    n = None
    ssum: dict[int, float] = {}
    g: dict[tuple[int, int], float] = {}
    for r in rows:
        if r["i"] == -1 and r["j"] == -1:
            n = int(r["g"])
        elif r["j"] == -1:
            ssum[r["i"]] = r["g"]
        else:
            g[(r["i"], r["j"])] = r["g"]
    if not n:
        raise ValueError("pca_fit: empty input")
    d = len(ssum)
    G = np.zeros((d, d))
    for (i, j), v in g.items():
        G[i, j] = G[j, i] = v
    s = np.array([ssum[i] for i in range(d)])
    q = float(quant)
    mean = s / (n * q)
    denom = max(n - 1, 1)
    cov = (G / (q * q) - np.outer(s / q, s / q) / n) / denom
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][: (d if k is None else k)]
    comps = vecs[:, order].T
    # canonical sign: the largest-magnitude coordinate of each
    # component is positive (eigh's sign is arbitrary)
    for r in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    return mean, comps, vals[order]


def pca_project(
    df: DataFrame,
    mean,
    components,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project the embedding column onto fitted components — a
    narrow, JVM-side expression (no Python in the hot path): each
    output coordinate is one `aggregate(zip_with(...))` dot product
    against a literal centered component vector. k literals of
    length d ride in the plan; the corpus is mapped, never
    shuffled."""
    exprs = []
    for r in range(components.shape[0]):
        comp = F.array(*[F.lit(float(c)) for c in components[r]])
        mu = float(components[r] @ mean)
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), comp, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        exprs.append(dot - F.lit(mu))
    return df.withColumn(out_col, F.array(*exprs))


def pca_explained_variance(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    quant: int = DEFAULT_QUANT,
) -> DataFrame:
    """Explained-variance summary of a PCA fit as a small DataFrame
    (component, eigenvalue, cumulative share of TOTAL variance —
    the trace, i.e. all d eigenvalues, not just the k shown) — the
    diagnostic a dimensionality-reduction decision reads.
    Driver-side scalars by construction (k rows)."""
    _, _, all_vals = pca_fit(df, vec_col, None, quant)
    total = float(all_vals.sum()) if len(all_vals) else 0.0
    vals = all_vals[:k]
    spark = df.sparkSession
    out, cum = [], 0.0
    for idx, v in enumerate(vals):
        cum += float(v)
        out.append((idx, float(v), cum / total if total > 0 else 0.0))
    return spark.createDataFrame(out, "component int, eigenvalue double, cum_share double")


def mahalanobis_scores(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = DEFAULT_QUANT,
    eps: float = 1e-9,
) -> DataFrame:
    """Per-vector squared Mahalanobis distance to the corpus
    distribution — the embedding-space outlier score used to filter
    corrupt/off-distribution documents before training: score(x) =
    Σᵢ ((x−μ)·vᵢ)² / (λᵢ+eps) over the full eigenbasis (exact
    Mahalanobis, not a truncation; for a d-dim embedding this is χ²_d
    distributed on in-distribution data, so thresholding at a χ²
    quantile gives a principled cut).

    Scale shape: one Gram pass (corpus never shuffles — see
    gram_matrix) + driver d×d eigensolve, then scoring is a single
    narrow JVM expression per row: d literal-component dot products
    and one zip_with against the literal eigenvalue array. No second
    shuffle anywhere; the output is (id, score)."""
    mean, comps, vals = pca_fit(df, vec_col, k=None, quant=quant)
    projected = pca_project(df, mean, comps, vec_col=vec_col, out_col="_pca")
    lam = F.array(*[F.lit(float(v) + eps) for v in vals])
    score = F.aggregate(
        F.zip_with(F.col("_pca"), lam, lambda p, l: p * p / l),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return projected.select(F.col(id_col), score.alias("score"))
