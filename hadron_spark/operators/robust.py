"""Robust statistics operators (median / MAD based).

The z-score tier (queries q119) flags anomalies against mean/stddev,
which an adversarial 1%-of-rows corruption can drag arbitrarily; the
median/MAD pair has a 50% breakdown point (Hampel 1974; Leys et al.
2013 for the outlier-detection form) and is the standard robust
replacement. Exactness discipline matches the stats tier: values
quantize to integer units (cents) ONCE, medians of integers are
half-integers and medians of absolute deviations quarter-integers —
all exactly representable doubles — and the flag test multiplies
through by the rational cutoff's denominator, so every comparison is
over exact doubles and the result hash-matches any engine stating
the same algebra."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    keep_cols: list[str] | None = None,
    cutoff_num: int = 3,
    cutoff_den: int = 1,
    scale: int = 100,
) -> DataFrame:
    """Flag rows whose |value - median(group)| exceeds
    (cutoff_num/cutoff_den) x MAD(group), MAD = median absolute
    deviation. Returns the flagged rows with the group's exact
    quantized median and mad attached.

    Plan: two grouped EXACT medians (Spark sort-based percentile —
    for the 100 TB path swap to approx_percentile, a documented
    one-word trade) producing tiny per-group tables that BROADCAST
    back onto the row scan; one partial-agg'd shuffle per median
    pass, zero shuffle on the flag join. MAD == 0 (>= half the group
    at the median) flags only rows strictly off the median when
    cutoff > 0 — the conventional degenerate-scale behavior."""
    if cutoff_num < 0 or cutoff_den <= 0:
        raise ValueError(f"cutoff must be >= 0: {cutoff_num}/{cutoff_den}")
    keep = keep_cols if keep_cols is not None else [
        c for c in df.columns if c not in group_cols
    ]
    q = df.select(
        *group_cols, *keep,
        F.round(F.col(value_col) * scale).cast("long").alias("_y"),
    )
    med = q.groupBy(*group_cols).agg(
        F.percentile("_y", F.lit(0.5)).alias("med")
    )
    dev = q.join(F.broadcast(med), group_cols).withColumn(
        "_dev", F.abs(F.col("_y").cast("double") - F.col("med"))
    )
    mad = dev.groupBy(*group_cols).agg(
        F.percentile("_dev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), group_cols)
        .filter(F.col("_dev") * cutoff_den > F.col("mad") * cutoff_num)
        .select(*group_cols, *keep, "med", "mad")
    )


def pass_rate_ci(
    df: DataFrame,
    group_cols: list[str],
    flag_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Per-group binomial pass-rate with Wilson score interval
    (Wilson 1927 — the interval that behaves at small n and extreme
    rates, unlike the Wald ±z√(p̂q̂/n) taught first): the
    data-quality report row for any boolean gate (filter pass rate,
    dedup survival rate, PII hit rate) with honest uncertainty.

    Bit-portable by the single-IEEE-chain discipline: k and n are
    exact longs; p̂, the center, the half-width (ONE sqrt —
    correctly rounded per IEEE, unlike ln/exp) and the bounds are a
    fixed-order chain of correctly-rounded ops that any engine
    stating the same tree reproduces exactly; bounds clamp to
    [0, 1] (the k=0/k=n analytic zeros land ~1e-17 outside in
    floats).  One partial-agg'd shuffle onto |groups| rows.

    Returns (group_cols..., n, k, rate, ci_lo, ci_hi)."""
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(flag_col).cast("long")).alias("k"),
    )
    zc = F.lit(float(z))
    z2 = zc * zc
    nd = F.col("n").cast("double")
    phat = F.col("k").cast("double") / nd
    denom = F.lit(1.0) + z2 / nd
    center = phat + z2 / (F.lit(2.0) * nd)
    half = zc * F.sqrt(
        phat * (F.lit(1.0) - phat) / nd + z2 / (F.lit(4.0) * nd * nd)
    )
    return agg.select(
        *group_cols,
        "n",
        "k",
        phat.alias("rate"),
        F.greatest(F.lit(0.0), (center - half) / denom).alias("ci_lo"),
        F.least(F.lit(1.0), (center + half) / denom).alias("ci_hi"),
    )


def winsorized_mean(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    scale: int = 100,
) -> DataFrame:
    """Per-group winsorized mean — the robust location estimate that
    keeps sample size (unlike trimming): values below/above the
    group's discrete p_lo/p_hi quantiles CLIP to those quantiles,
    then average.

    `percentile_disc` bounds are ACTUAL data elements (no
    interpolation), so after integer quantization every clipped
    value is still an exact long; the mean is one IEEE division of
    an exact integer sum — bit-portable, where an interpolated-
    percentile clip would smear a non-dyadic double over many rows
    and make the sum order-sensitive.  Plan: one quantile pass per
    group broadcast back onto the scan (q111's two-level shape),
    one partial-agg'd sum.  Returns (group_cols..., n, n_clip_lo,
    n_clip_hi, wmean) with wmean in ORIGINAL units."""
    if not (0.0 <= p_lo < p_hi <= 1.0):
        raise ValueError(f"need 0 <= p_lo < p_hi <= 1: {p_lo}/{p_hi}")
    q = df.select(
        *group_cols, F.round(F.col(value_col) * scale).cast("long").alias("_y")
    )
    bounds = q.groupBy(*group_cols).agg(
        F.expr(f"percentile_disc({p_lo}) WITHIN GROUP (ORDER BY _y)").alias("_lo"),
        F.expr(f"percentile_disc({p_hi}) WITHIN GROUP (ORDER BY _y)").alias("_hi"),
    )
    c = q.join(F.broadcast(bounds), group_cols)
    clipped = F.greatest("_lo", F.least("_hi", F.col("_y")))
    return (
        c.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("_y") < F.col("_lo"), 1).otherwise(0)).alias(
                "n_clip_lo"
            ),
            F.sum(F.when(F.col("_y") > F.col("_hi"), 1).otherwise(0)).alias(
                "n_clip_hi"
            ),
            F.sum(clipped).alias("_s"),
        )
        .select(
            *group_cols,
            "n",
            "n_clip_lo",
            "n_clip_hi",
            (
                F.col("_s").cast("double")
                / (F.col("n") * scale).cast("double")
            ).alias("wmean"),
        )
    )
