"""Model-based quality filtering: a tiny logistic-regression document
classifier, trained distributed and applied as one JVM expression —
the quality-classifier stage of CCNet/GPT-3-style pretraining
pipelines (Wenzek et al. 2020, arXiv:1911.00359; Brown et al. 2020
§A) re-expressed Spark-first.

Shape:
- FEATURES (`quality_feature_columns`) are pure JVM expressions of
  exact integer counts with one IEEE division each (the q51 oracle
  discipline), so a scored corpus is SQL-oracle-checkable and the
  feature pass fuses into the scan — no UDF, no shuffle.
- TRAINING (`train_quality_classifier`) is full-batch gradient
  descent driver-coordinated like `similarity.kmeans`: the feature
  frame is pinned once; each round is ONE tiny aggregation job
  producing d+1 gradient scalars (partial-agg'd, corpus never
  shuffles); only the weight vector lives on the driver.  Bounded
  state: O(d) per round regardless of corpus size.
- APPLICATION (`apply_quality_classifier`) broadcasts the weights as
  literals into a single linear expression z = w·f; the keep
  decision is `z >= z_threshold` — thresholding the LOGIT, which is
  equivalent to thresholding the sigmoid probability
  (z ≥ logit(τ) ⇔ σ(z) ≥ τ) but avoids exp() in the hot path and
  keeps the whole scoring pass exp-free and cross-engine exact
  (sqrt is correctly rounded per IEEE-754; exp/ln are not — the
  same reasoning that keeps ln out of every oracle in this repo).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadron_spark.functions.text import STOPWORDS, tokenize
from hadron_spark.operators.ops import pin

#: canonical feature order — training and application must agree on it
FEATURE_NAMES = ("mean_token_len", "stop_frac", "len_feat", "digit_frac")


def quality_feature_columns(text_col: Column | str) -> dict[str, Column]:
    """The classifier's feature map — exact-int-ratio expressions:

    - mean_token_len: token characters / tokens
    - stop_frac: stopword hits / tokens
    - len_feat: min(tokens, 1000) / 1000 (bounded length signal)
    - digit_frac: digit characters / characters

    Every feature is integers + ONE division, so scores built from
    them hash-match a DuckDB replay."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokenize(c)
    n_tok = F.size(toks)
    nz_tok = F.greatest(n_tok, F.lit(1))
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    low = F.transform(toks, lambda t: F.lower(t))
    stop_hits = F.size(F.filter(low, lambda t: t.isin(STOPWORDS)))
    n_chars = F.length(c)
    digit_chars = n_chars - F.length(F.regexp_replace(c, "[0-9]", ""))
    return {
        "mean_token_len": tok_chars.cast("double") / nz_tok,
        "stop_frac": stop_hits.cast("double") / nz_tok,
        "len_feat": F.least(n_tok, F.lit(1000)).cast("double") / F.lit(1000),
        "digit_frac": digit_chars.cast("double")
        / F.greatest(n_chars, F.lit(1)),
    }


def featurize(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, <FEATURE_NAMES...>) — one narrow pass."""
    cols = quality_feature_columns(text_col)
    return df.select(
        F.col(id_col), *[cols[n].alias(n) for n in FEATURE_NAMES]
    )


def linear_score(weights: dict[str, float]) -> Column:
    """z = bias + Σ w_i·f_i over the FEATURE_NAMES columns, built in
    canonical left-to-right order so Spark and any SQL replay of the
    same literals round identically at every step."""
    z: Column = F.lit(float(weights["bias"]))
    for n in FEATURE_NAMES:
        z = z + F.col(n) * F.lit(float(weights[n]))
    return z


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lr: float = 1.0,
    iters: int = 100,
    l2: float = 0.0,
) -> dict[str, float]:
    """Full-batch logistic regression on the quality features.

    `label_col` is 0/1 (1 = high quality).  Returns the weight dict
    {bias, mean_token_len, stop_frac, len_feat, digit_frac}.

    Features are STANDARDIZED internally (z-scored with one extra
    moments aggregation) so gradient descent converges at the same
    rate on every feature regardless of its natural scale — raw
    mean_token_len lives near 4.5 while len_feat lives near 0.05,
    and unnormalized GD on that conditioning needs thousands of
    rounds.  The returned weights are DE-standardized back to raw
    feature space, so `apply_quality_classifier` (and the q204
    oracle form) consume them directly.

    Each iteration runs one aggregation over the PINNED feature
    frame: grad_j = mean((σ(z) − y)·f_j) — d+1 scalars to the
    driver, weights updated there (the kmeans driver-coordination
    contract; with d=4 this is 5 doubles per round).  The sigmoid
    runs JVM-side inside the aggregate — no Python row work."""
    raw = pin(
        featurize(df, id_col, text_col).join(
            df.select(id_col, F.col(label_col).cast("double").alias("_y")),
            id_col,
        )
    )
    n = raw.count()
    if n == 0:
        raise ValueError("cannot train on an empty frame")
    m = raw.agg(
        *[F.avg(name).alias(f"mu_{name}") for name in FEATURE_NAMES],
        *[
            F.stddev_pop(name).alias(f"sd_{name}")
            for name in FEATURE_NAMES
        ],
    ).first()
    mu = {name: float(m[f"mu_{name}"]) for name in FEATURE_NAMES}
    sd = {
        name: float(m[f"sd_{name}"]) if m[f"sd_{name}"] else 1.0
        for name in FEATURE_NAMES
    }
    sd = {k: (v if v > 0 else 1.0) for k, v in sd.items()}
    feats = pin(
        raw.select(
            "_y",
            *[
                ((F.col(name) - F.lit(mu[name])) / F.lit(sd[name])).alias(
                    name
                )
                for name in FEATURE_NAMES
            ],
        )
    )
    w = {"bias": 0.0, **{name: 0.0 for name in FEATURE_NAMES}}
    for _ in range(iters):
        z = linear_score(w)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - F.col("_y")
        aggs = [F.sum(err).alias("g_bias")] + [
            F.sum(err * F.col(name)).alias(f"g_{name}")
            for name in FEATURE_NAMES
        ]
        g = feats.agg(*aggs).first()
        w["bias"] -= lr * (g["g_bias"] / n + l2 * w["bias"])
        for name in FEATURE_NAMES:
            w[name] -= lr * (g[f"g_{name}"] / n + l2 * w[name])
    # de-standardize: z = b + Σ w_j (f_j - mu_j)/sd_j
    #               = (b - Σ w_j mu_j / sd_j) + Σ (w_j / sd_j) f_j
    out = {
        "bias": w["bias"]
        - sum(w[name] * mu[name] / sd[name] for name in FEATURE_NAMES)
    }
    for name in FEATURE_NAMES:
        out[name] = w[name] / sd[name]
    return out


def apply_quality_classifier(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    z_threshold: float = 0.0,
) -> DataFrame:
    """(id_col, z, keep) — score every document with the literal
    weight vector and threshold the logit (z_threshold=0 ⇔ p≥0.5;
    use logit(τ) for any other probability cut).  One narrow
    expression, no shuffle,
    exp-free — oracle-exact."""
    scored = featurize(df, id_col, text_col).withColumn(
        "z", linear_score(weights)
    )
    return scored.select(
        id_col,
        "z",
        (F.col("z") >= F.lit(float(z_threshold))).alias("keep"),
    )
