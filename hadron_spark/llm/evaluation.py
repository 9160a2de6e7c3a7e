"""Classifier evaluation for quality-filter pipelines: exact
precision/recall curves (threshold calibration) and exact tie-aware
ROC AUC — the numbers a curation team reads before wiring a trained
filter (`llm.classifier`) into the funnel.

Exactness discipline: everything reduces to integer counts on a
DISTINCT-SCORE SPINE (one row per observed score with its positive /
total counts), cumulated with `operators.ops.range_cumsum` (banded
two-pass prefix — never a single-partition window), then one
correctly-rounded IEEE division per reported ratio. Ties are handled
the textbook way (Mann-Whitney average ranks, kept integral by
working in DOUBLED rank units), so every number — including the AUC
— hash-matches a SQL engine stating the same algebra.

100 TB shape: the corpus aggregates to the spine with one
partial-agg'd shuffle (|spine| = distinct scores, bounded for any
quantized/integer score); all downstream passes run on the spine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadron_spark.operators.ops import pin, range_cumsum


def _score_spine(
    df: DataFrame, score_col: str, label_col: str, materialize: str
) -> DataFrame:
    """(score, n_pos, n_tot, cum_pos, cum_tot) — cums EXCLUSIVE,
    ascending score order. Label must be 0/1-valued."""
    spine = (
        df.select(
            F.col(score_col).alias("score"),
            F.col(label_col).cast("long").alias("_y"),
        )
        .groupBy("score")
        .agg(
            F.sum("_y").alias("n_pos"),
            F.count(F.lit(1)).alias("n_tot"),
        )
    )
    spine = pin(spine, materialize)
    spine = range_cumsum(
        spine,
        key=F.col("score"),
        val=F.col("n_pos"),
        order=[F.col("score").asc()],
        out_col="cum_pos",
        materialize="none",
    )
    # the second pass pins its input (the first pass's output feeds
    # the min/max, per-band, and windowed branches); the first runs
    # unpinned off the already-pinned spine
    return range_cumsum(
        spine,
        key=F.col("score"),
        val=F.col("n_tot"),
        order=[F.col("score").asc()],
        out_col="cum_tot",
        materialize="local_checkpoint",
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    materialize: str = "local_checkpoint",
) -> DataFrame:
    """Exact precision/recall/F1 at EVERY observed decision threshold
    (predict positive when score >= t, one row per distinct score) —
    the table a team scans to pick a filter cutoff for a target
    precision, stated without interpolation or binning.

    tp(t) = P − cum_pos(<t), predicted(t) = N − cum_tot(<t) from the
    ascending exclusive prefixes; precision/recall/F1 are single
    divisions of those exact longs (F1 = 2tp/(pred+P) — already a
    ratio of ints, no P,R intermediates). Returns (threshold, tp,
    fp, fn, precision, recall, f1) ordered-agnostic."""
    spine = _score_spine(df, score_col, label_col, materialize)
    tot = spine.agg(
        F.sum("n_pos").alias("_P"), F.sum("n_tot").alias("_N")
    )
    s = spine.crossJoin(F.broadcast(tot))
    tp = F.col("_P") - F.col("cum_pos")
    pred = F.col("_N") - F.col("cum_tot")
    return s.select(
        F.col("score").alias("threshold"),
        tp.alias("tp"),
        (pred - tp).alias("fp"),
        (F.col("_P") - tp).alias("fn"),
        (tp.cast("double") / pred.cast("double")).alias("precision"),
        (tp.cast("double") / F.col("_P").cast("double")).alias("recall"),
        (
            (tp * 2).cast("double") / (pred + F.col("_P")).cast("double")
        ).alias("f1"),
    )


def auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    materialize: str = "local_checkpoint",
) -> DataFrame:
    """Exact ROC AUC via the Mann-Whitney U statistic with textbook
    tie handling (average ranks), one row:
    (n_pos, n_neg, u2, auc) where u2 = 2·U (kept integral — a tied
    group's average rank is a half-integer, so DOUBLED rank units
    stay in int64) and auc = u2 / (2·n_pos·n_neg), one IEEE
    division — bit-portable.

    Ranks never materialize per row: ascending-score group ranks
    come from the spine's exclusive prefix (avg doubled rank of a
    group = 2·cum_tot + n_tot + 1), weighted by the group's
    positive count — one spine pass after the corpus aggregate."""
    spine = _score_spine(df, score_col, label_col, materialize)
    r2 = (
        spine.select(
            (
                F.col("n_pos") * (F.col("cum_tot") * 2 + F.col("n_tot") + 1)
            ).alias("_r2"),
            "n_pos",
            "n_tot",
        )
        .agg(
            F.sum("_r2").alias("_R2"),
            F.sum("n_pos").alias("n_pos"),
            (F.sum("n_tot") - F.sum("n_pos")).alias("n_neg"),
        )
    )
    u2 = F.col("_R2") - F.col("n_pos") * (F.col("n_pos") + 1)
    return r2.select(
        "n_pos",
        "n_neg",
        u2.alias("u2"),
        (
            u2.cast("double")
            / (F.col("n_pos") * F.col("n_neg") * 2).cast("double")
        ).alias("auc"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """Inter-annotator agreement (Cohen 1960) over two categorical
    label columns — the RLHF/eval-annotation QC number: chance-
    corrected agreement kappa = (p_o − p_e)/(1 − p_e).

    Integer-exact end to end: with confusion counts n_ab, row/col
    marginals r_k, c_k and N rows,
        kappa = (N·Σ_k n_kk − Σ_k r_k·c_k) / (N² − Σ_k r_k·c_k)
    — ONE IEEE division of two exact int64s (p_o, p_e are also
    emitted as single divisions), so everything hashes.  Rows where
    either label is NULL are dropped (unlabeled).

    Plan: one partial-agg'd shuffle to the k×k confusion matrix;
    marginals and the scalar algebra run on that tiny frame
    (broadcast joins).  Returns one row (n, agree, kappa_num,
    kappa_den, p_o, p_e, kappa)."""
    pairs = (
        df.select(F.col(rater_a).alias("_a"), F.col(rater_b).alias("_b"))
        .filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    pairs = pin(pairs)
    ra = pairs.groupBy("_a").agg(F.sum("_n").alias("_r"))
    cb = pairs.groupBy("_b").agg(F.sum("_n").alias("_c"))
    pe_sum = (
        ra.join(cb, ra["_a"] == cb["_b"])
        .agg(F.sum(F.col("_r") * F.col("_c")).alias("_pe"))
    )
    tot = pairs.agg(
        F.sum("_n").alias("_N"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_n")).otherwise(0)).alias(
            "_agree"
        ),
    )
    j = tot.crossJoin(F.broadcast(pe_sum)).select(
        "_N",
        "_agree",
        F.coalesce("_pe", F.lit(0)).alias("_pe"),
    )
    num = F.col("_N") * F.col("_agree") - F.col("_pe")
    den = F.col("_N") * F.col("_N") - F.col("_pe")
    return j.select(
        F.col("_N").alias("n"),
        F.col("_agree").alias("agree"),
        num.alias("kappa_num"),
        den.alias("kappa_den"),
        (F.col("_agree").cast("double") / F.col("_N").cast("double")).alias("p_o"),
        (F.col("_pe").cast("double") / (F.col("_N") * F.col("_N")).cast("double")).alias(
            "p_e"
        ),
        (num.cast("double") / den.cast("double")).alias("kappa"),
    )


def calibration_bins(
    df: DataFrame,
    prob_units_col: str,
    label_col: str,
    n_bins: int = 10,
    scale: int = 100,
) -> DataFrame:
    """Reliability-diagram bins over integer-unit probabilities
    (prob_units in [0, scale], e.g. percent): per equal-width bin,
    count, mean confidence, and empirical accuracy — the table
    behind a calibration plot for a quality classifier.

    Everything is exact: bin = min(n_bins−1, units·n_bins div
    scale) is integer math; confidence = Σunits/(n·scale) and
    accuracy = Σpos/n are single IEEE divisions; `gap_num` =
    |Σpos·scale − Σunits| is the bin's calibration-gap NUMERATOR
    kept as an exact integer so `ece` can sum it without
    float-order sensitivity.  One partial-agg'd shuffle onto
    ≤ n_bins rows.  Returns (bin, n, sum_units, sum_pos,
    confidence, accuracy, gap_num)."""
    if n_bins < 1 or scale < 1:
        raise ValueError(f"n_bins/scale must be >= 1: {n_bins}/{scale}")
    u = F.col(prob_units_col).cast("long")
    b = F.least(F.lit(n_bins - 1), F.expr(f"({prob_units_col} * {n_bins}) div {scale}"))
    binned = df.select(
        b.cast("int").alias("bin"),
        u.alias("_u"),
        F.col(label_col).cast("long").alias("_y"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_u").alias("sum_units"),
        F.sum("_y").alias("sum_pos"),
    )
    return agg.select(
        "bin",
        "n",
        "sum_units",
        "sum_pos",
        (
            F.col("sum_units").cast("double")
            / (F.col("n") * scale).cast("double")
        ).alias("confidence"),
        (F.col("sum_pos").cast("double") / F.col("n").cast("double")).alias(
            "accuracy"
        ),
        F.abs(F.col("sum_pos") * scale - F.col("sum_units")).alias("gap_num"),
    )


def expected_calibration_error(
    df: DataFrame,
    prob_units_col: str,
    label_col: str,
    n_bins: int = 10,
    scale: int = 100,
) -> DataFrame:
    """ECE (Naeini et al. 2015) with NO float accumulation: the
    standard Σ_b (n_b/N)·|acc_b − conf_b| telescopes to
    Σ_b |Σpos_b·scale − Σunits_b| / (N·scale) — an exact INTEGER
    numerator summed over bins, then ONE IEEE division.  Bin-sum
    order can never perturb the result, so the scalar hashes.
    One row: (n, ece_num, ece)."""
    bins = calibration_bins(df, prob_units_col, label_col, n_bins, scale)
    return bins.agg(
        F.sum("n").alias("n"),
        F.sum("gap_num").alias("ece_num"),
    ).select(
        "n",
        "ece_num",
        (
            F.col("ece_num").cast("double")
            / (F.col("n") * scale).cast("double")
        ).alias("ece"),
    )
