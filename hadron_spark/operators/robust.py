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
