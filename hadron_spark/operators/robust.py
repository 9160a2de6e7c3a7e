"""Robust and nonparametric statistics operators.

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


def _two_sample_spine(
    new: DataFrame,
    old: DataFrame,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Shared substrate for the two-sample tests: per (group, value)
    side counts (cnt_new, cnt_old) plus cumulative counts
    (cum_new, cum_old) in value order and group totals (n_new,
    n_old).  Values must already be integers (quantize upstream) so
    every engine orders and ties identically.  One partial-agg'd
    shuffle per side onto the distinct-value spine; the cumulative
    window re-uses the groupBy partitioning; totals broadcast."""
    from pyspark.sql import Window

    tag = lambda df, s: df.select(  # noqa: E731
        *group_cols, F.col(value_col).cast("long").alias("_v"), F.lit(s).alias("_s")
    ).filter(F.col("_v").isNotNull())
    u = tag(new, 1).unionByName(tag(old, 0))
    cnt = u.groupBy(*group_cols, "_v").agg(
        F.sum("_s").alias("cnt_new"),
        F.sum(1 - F.col("_s")).alias("cnt_old"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cnt.select(
        *group_cols,
        "_v",
        "cnt_new",
        "cnt_old",
        F.sum("cnt_new").over(w).alias("cum_new"),
        F.sum("cnt_old").over(w).alias("cum_old"),
    )
    tot = cnt.groupBy(*group_cols).agg(
        F.sum("cnt_new").alias("n_new"), F.sum("cnt_old").alias("n_old")
    )
    if group_cols:
        return cum.join(F.broadcast(tot), group_cols)
    return cum.crossJoin(F.broadcast(tot))


def ks_two_sample(
    new: DataFrame,
    old: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per group — the
    EXACT distributional-drift number next to `psi_drift`'s
    rows-only cells and `category_drift`'s chi-square:
    D = max_x |F_new(x) − F_old(x)| over the merged support.

    Integer-exact end to end: over the cross-multiplied form
    d_num = max |cum_new·n_old − cum_old·n_new| the max is over
    exact int64s, and D is ONE IEEE division d_num/(n_new·n_old) —
    so the frame hashes cross-engine.  `at_value` is the SMALLEST
    value achieving the max (struct-ordered max, deterministic under
    ties).  int64 bound: n_new·n_old < 2^63, i.e. ~3·10⁹ rows per
    side per group; past that, pre-bin values onto a histogram spine
    (streaming.ops.incremental_histogram) first — at 100 TB the
    binned D is the honest statistic anyway.

    Plan: one partial-agg'd shuffle per side onto the distinct-value
    spine, a bounded per-group cumulative window, totals broadcast.
    Returns (group_cols..., n_new, n_old, d_num, at_value, d)."""
    gc = list(group_cols or [])
    s = _two_sample_spine(new, old, value_col, gc)
    num = F.abs(
        F.col("cum_new") * F.col("n_old") - F.col("cum_old") * F.col("n_new")
    )
    best = s.groupBy(*gc, "n_new", "n_old").agg(
        F.max(F.struct(num.alias("d_num"), (-F.col("_v")).alias("_negv"))).alias(
            "_b"
        )
    )
    return best.select(
        *gc,
        "n_new",
        "n_old",
        F.col("_b.d_num").alias("d_num"),
        (-F.col("_b._negv")).alias("at_value"),
        (
            F.col("_b.d_num").cast("double")
            / (F.col("n_new") * F.col("n_old")).cast("double")
        ).alias("d"),
    )


def mann_whitney_u(
    new: DataFrame,
    old: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) per group — the
    nonparametric "did the score distribution shift up or down"
    test for comparing two model/filter score populations without
    a normality assumption.

    Rank algebra stays in exact int64 by scaling ranks ×2 (the
    average rank of a tie run of t values starting after c rows is
    c + (t+1)/2 — a half-integer): r2 = 2·c_before + t + 1, so
    r1_x2 = Σ_values cnt_new·(2·(cum−t) + t + 1) and
    u_x2 = r1_x2 − n_new·(n_new+1) are exact longs, as is the tie
    term Σ(t³−t).  The normal-approximation z uses the
    tie-corrected variance
        var = (n1·n2/12)·((n+1) − Σ(t³−t)/(n·(n−1)))
    as a FIXED chain of IEEE ops from those exact integers (one
    sqrt — correctly rounded per IEEE), so even z hashes
    cross-engine.  int64 bounds: t³ < 2^63 needs the largest tie
    run < 2.1·10⁶ — quantized-but-not-degenerate values; at 100 TB
    pre-bin onto a histogram spine and rank the bins.

    Plan identical to `ks_two_sample` (shared spine).  Returns
    (group_cols..., n_new, n_old, r1_x2, u_x2, tie_term, u, z);
    u is U of the NEW side — U_old = n1·n2 − U_new."""
    gc = list(group_cols or [])
    s = _two_sample_spine(new, old, value_col, gc)
    t = F.col("cnt_new") + F.col("cnt_old")
    cum = F.col("cum_new") + F.col("cum_old")
    r2 = 2 * (cum - t) + t + 1
    agg = s.groupBy(*gc, "n_new", "n_old").agg(
        F.sum(F.col("cnt_new") * r2).alias("r1_x2"),
        F.sum(t * t * t - t).alias("tie_term"),
    )
    n1 = F.col("n_new")
    n2 = F.col("n_old")
    n = n1 + n2
    u_x2 = F.col("r1_x2") - n1 * (n1 + 1)
    n1d = n1.cast("double")
    n2d = n2.cast("double")
    nd = n.cast("double")
    var = (n1d * n2d / F.lit(12.0)) * (
        (nd + F.lit(1.0))
        - F.col("tie_term").cast("double") / (nd * (nd - F.lit(1.0)))
    )
    z = (u_x2.cast("double") - n1d * n2d) / (F.lit(2.0) * F.sqrt(var))
    return agg.select(
        *gc,
        "n_new",
        "n_old",
        "r1_x2",
        u_x2.alias("u_x2"),
        "tie_term",
        (u_x2.cast("double") / F.lit(2.0)).alias("u"),
        z.alias("z"),
    )


def spearman_rho(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Spearman rank correlation per group, tie-correct — Pearson
    over average ranks (the only form that is right under ties;
    the 1 − 6Σd²/(n(n²−1)) shortcut is tie-free only).  The
    monotone-association number for "does quality score track
    document length" style audits where Pearson's linearity
    assumption is wrong.

    Average ranks scale ×2 into exact int64 (tie-run average is a
    half-integer), so n, Σrx, Σry, Σrx², Σry², Σrx·ry are all exact
    longs; rho is then a FIXED chain of IEEE ops (two sqrts) over
    their double images —
        rho = (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²)·√(n·Syy − Sy²))
    — bit-portable cross-engine.  int64/2^53 bound: Σrx·ry ≤ 4n³
    must stay < 2^53 for the double images to be exact, i.e.
    n < ~1.3·10⁶ rows per group; past that rank against a binned
    spine.  Values must be integers (quantize upstream).

    Plan: one distinct-value rank pass per axis (groupBy + bounded
    cumulative window), ranks join back on the value spine
    (broadcast when small), one partial-agg'd sum pass.  Returns
    (group_cols..., n, rho); constant axes (zero rank variance)
    yield rho NULL."""
    from pyspark.sql import Window

    gc = list(group_cols or [])
    # pairwise-complete observations (ADVICE r4): a row missing
    # EITHER axis contributes to neither rank spine — without this,
    # a NULL-x row still fed y's spine while silently dropping at
    # the rank join (nonstandard semantics); mirrors
    # _two_sample_spine's explicit isNotNull filter
    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())

    def rank2(col: str, alias: str) -> DataFrame:
        cnt = (
            df.select(*gc, F.col(col).cast("long").alias("_v"))
            .groupBy(*gc, "_v")
            .agg(F.count(F.lit(1)).alias("_t"))
        )
        w = (
            Window.partitionBy(*gc)
            .orderBy("_v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return cnt.select(
            *gc,
            F.col("_v").alias(f"_{alias}v"),
            (2 * (F.sum("_t").over(w) - F.col("_t")) + F.col("_t") + 1).alias(
                f"_{alias}r2"
            ),
        )
    base = df.select(
        *gc,
        F.col(x_col).cast("long").alias("_xv"),
        F.col(y_col).cast("long").alias("_yv"),
    )
    ranked = base.join(rank2(x_col, "x"), [*gc, "_xv"]).join(
        rank2(y_col, "y"), [*gc, "_yv"]
    )
    agg = ranked.groupBy(*gc).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_xr2").alias("sx"),
        F.sum("_yr2").alias("sy"),
        F.sum(F.col("_xr2") * F.col("_xr2")).alias("sxx"),
        F.sum(F.col("_yr2") * F.col("_yr2")).alias("syy"),
        F.sum(F.col("_xr2") * F.col("_yr2")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    vx = nd * F.col("sxx").cast("double") - sxd * sxd
    vy = nd * F.col("syy").cast("double") - syd * syd
    rho = (nd * F.col("sxy").cast("double") - sxd * syd) / (
        F.sqrt(vx) * F.sqrt(vy)
    )
    return agg.select(
        *gc,
        "n",
        F.when((vx > 0) & (vy > 0), rho).alias("rho"),
    )


def kendall_tau_b(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Kendall's tau-b per group, tie-correct and integer-exact —
    the concordance twin of `spearman_rho` (tau's bounded influence
    per pair makes it the more robust of the two; Kendall 1945 for
    the tie-corrected b form).

    CONTRACT: both axes must be quantized to BOUNDED cardinality
    (buckets/bands/grades — say ≤ ~10⁴ distinct values per group).
    The corpus aggregates to (x, y) CELL counts with one
    partial-agg'd shuffle — 100 TB of rows becomes |X|·|Y| cells —
    and the pair algebra runs on the bounded cell table's self-join
    (strict x < x', each unordered row pair counted exactly once):
        P = Σ c·c' [y' > y]   (concordant)
        Q = Σ c·c' [y' < y]   (discordant)
    with marginal tie terms n1 = Σ t_x(t_x−1)/2, n2 = Σ t_y(t_y−1)/2
    and n0 = n(n−1)/2, all exact int64;
        tau_b = (P − Q) / (√(n0−n1)·√(n0−n2))
    is a fixed IEEE chain (two sqrts) over their double images —
    hash-exact cross-engine.  Unbanded continuous axes are the
    scale trap here (cells ≈ rows): quantize first, which is also
    what keeps P−Q statistically honest at corpus scale.  int64
    bound: n(n−1)/2 < 2^63 → n < 4.3·10⁹ rows per group; P,Q ≤ n0.

    Plan: one shuffle to cells, one cell self-join keyed on the
    group (both sides the same tiny frame), marginals as two more
    cell-table aggs, everything joined on |groups| rows.  Returns
    (group_cols..., n, concordant, discordant, tie_x, tie_y,
    tau_b); an all-tied axis yields tau_b NULL."""
    gc = list(group_cols or [])
    cells = (
        # pairwise-complete observations (ADVICE r4): NULL cells
        # would distort the pair terms while their rows' pairs
        # silently vanish — filter both axes up front, matching
        # spearman_rho / _two_sample_spine
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(
            *gc,
            F.col(x_col).cast("long").alias("_x"),
            F.col(y_col).cast("long").alias("_y"),
        )
        .groupBy(*gc, "_x", "_y")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    from hadron_spark.operators.ops import pin

    cells = pin(cells)
    a, b = cells.alias("a"), cells.alias("b")
    cond = F.col("a._x") < F.col("b._x")
    for g in gc:
        cond = cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    prod = F.col("a._c") * F.col("b._c")
    pq = (
        a.join(b, cond)
        .groupBy(*[F.col(f"a.{g}").alias(g) for g in gc])
        .agg(
            F.sum(F.when(F.col("b._y") > F.col("a._y"), prod).otherwise(0)).alias(
                "concordant"
            ),
            F.sum(F.when(F.col("b._y") < F.col("a._y"), prod).otherwise(0)).alias(
                "discordant"
            ),
        )
    )
    n_tot = cells.groupBy(*gc).agg(F.sum("_c").alias("n"))
    tx = (
        cells.groupBy(*gc, "_x")
        .agg(F.sum("_c").alias("_t"))
        .groupBy(*gc)
        .agg(F.sum(F.expr("_t * (_t - 1) div 2")).alias("tie_x"))
    )
    ty = (
        cells.groupBy(*gc, "_y")
        .agg(F.sum("_c").alias("_t"))
        .groupBy(*gc)
        .agg(F.sum(F.expr("_t * (_t - 1) div 2")).alias("tie_y"))
    )
    if gc:
        j = (
            n_tot.join(pq, gc, "left")
            .join(tx, gc)
            .join(ty, gc)
            .select(
                *gc,
                "n",
                F.coalesce("concordant", F.lit(0)).alias("concordant"),
                F.coalesce("discordant", F.lit(0)).alias("discordant"),
                "tie_x",
                "tie_y",
            )
        )
    else:
        j = (
            n_tot.crossJoin(F.broadcast(pq))
            .crossJoin(F.broadcast(tx))
            .crossJoin(F.broadcast(ty))
            .select(
                "n",
                F.coalesce("concordant", F.lit(0)).alias("concordant"),
                F.coalesce("discordant", F.lit(0)).alias("discordant"),
                "tie_x",
                "tie_y",
            )
        )
    n0 = F.expr("n * (n - 1) div 2")
    dx = (n0 - F.col("tie_x")).cast("double")
    dy = (n0 - F.col("tie_y")).cast("double")
    tau = (F.col("concordant") - F.col("discordant")).cast("double") / (
        F.sqrt(dx) * F.sqrt(dy)
    )
    return j.select(
        *gc,
        "n",
        "concordant",
        "discordant",
        "tie_x",
        "tie_y",
        F.when((dx > 0) & (dy > 0), tau).alias("tau_b"),
    )


def two_proportion_test(
    new: DataFrame,
    old: DataFrame,
    flag_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Two-proportion z-test per group — the A/B primitive next to
    `pass_rate_ci`'s single-arm Wilson interval: did the pass/hit
    rate move between snapshots, stated with the pooled-variance
    normal z.

    Counts are exact longs; rates, the pooled rate, and
        z = (p_new − p_old) / √(p̂(1−p̂)(1/n_new + 1/n_old))
    are a fixed chain of correctly-rounded IEEE ops (ONE sqrt), so
    the whole frame hashes cross-engine.  Degenerate pools (p̂ = 0
    or 1 — zero variance) yield z NULL rather than ±inf.

    One partial-agg'd shuffle per side onto |groups| rows.  Returns
    (group_cols..., n_new, k_new, n_old, k_old, rate_new, rate_old,
    diff, z)."""
    gc = list(group_cols or [])

    def side(df: DataFrame, n: str, k: str) -> DataFrame:
        return df.groupBy(*gc).agg(
            F.count(F.lit(1)).alias(n),
            F.sum(F.col(flag_col).cast("long")).alias(k),
        )

    a = side(new, "n_new", "k_new")
    b = side(old, "n_old", "k_old")
    j = a.join(b, gc) if gc else a.crossJoin(F.broadcast(b))
    n1 = F.col("n_new").cast("double")
    n2 = F.col("n_old").cast("double")
    p1 = F.col("k_new").cast("double") / n1
    p2 = F.col("k_old").cast("double") / n2
    pool = (F.col("k_new") + F.col("k_old")).cast("double") / (
        F.col("n_new") + F.col("n_old")
    ).cast("double")
    var = pool * (F.lit(1.0) - pool) * (F.lit(1.0) / n1 + F.lit(1.0) / n2)
    return j.select(
        *gc,
        "n_new",
        "k_new",
        "n_old",
        "k_old",
        p1.alias("rate_new"),
        p2.alias("rate_old"),
        (p1 - p2).alias("diff"),
        F.when(var > 0, (p1 - p2) / F.sqrt(var)).alias("z"),
    )


def theil_sen_slope(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Theil–Sen robust slope per group — the weighted median of all
    pairwise slopes (Theil 1950, Sen 1968; 29.3% breakdown point vs
    least-squares' zero): the trend estimate that shrugs off the
    outlier days a z-score fit would chase.

    Same bounded-cell contract as `kendall_tau_b`: BOTH axes
    quantized, the corpus reduces to (x, y) cells in one shuffle,
    and the pair algebra runs on the cell self-join (x < x' only —
    vertical pairs are slope-undefined and excluded, the classic
    convention).  Each cell pair is ONE slope dy/dx carrying weight
    c·c', so the weighted median over pairs equals the plain median
    over the underlying row pairs.  The median is the LOWER weighted
    median: the smallest slope (ordered by the IEEE quotient dy/dx,
    ties by (dy, dx) — both engines order identically since IEEE
    division is correctly rounded) whose cumulative weight w
    satisfies 2·cum ≥ W.  Selection is a struct-ordered min after
    the threshold filter — deterministic, hash-exact; the slope is
    reported BOTH as the exact rational (slope_dy, slope_dx) and
    the double quotient.

    Plan: cells shuffle, per-group cell self-join, one per-group
    cumulative window over the bounded slope frame (≤ |cells|²/2
    rows per group — the quantization contract's knob), a
    partial-agg'd threshold pick.  Returns (group_cols..., n_pairs,
    slope_dy, slope_dx, slope); groups with no x-distinct pair
    (constant x) are absent."""
    from pyspark.sql import Window

    from hadron_spark.operators.ops import pin

    gc = list(group_cols or [])
    cells = (
        # pairwise-complete observations (ADVICE r4): NULL cells
        # would distort the pair terms while their rows' pairs
        # silently vanish — filter both axes up front, matching
        # spearman_rho / _two_sample_spine
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(
            *gc,
            F.col(x_col).cast("long").alias("_x"),
            F.col(y_col).cast("long").alias("_y"),
        )
        .groupBy(*gc, "_x", "_y")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    cells = pin(cells)
    a, b = cells.alias("a"), cells.alias("b")
    cond = F.col("a._x") < F.col("b._x")
    for g in gc:
        cond = cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    slopes = a.join(b, cond).select(
        *[F.col(f"a.{g}").alias(g) for g in gc],
        (F.col("b._y") - F.col("a._y")).alias("_dy"),
        (F.col("b._x") - F.col("a._x")).alias("_dx"),
        (F.col("a._c") * F.col("b._c")).alias("_w"),
    ).withColumn(
        "_s", F.col("_dy").cast("double") / F.col("_dx").cast("double")
    )
    w_ord = (
        Window.partitionBy(*(gc or [F.lit(1)]))
        .orderBy("_s", "_dy", "_dx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = slopes.withColumn("_cum", F.sum("_w").over(w_ord))
    tot = slopes.groupBy(*gc).agg(F.sum("_w").alias("_wtot"))
    j = cum.join(F.broadcast(tot), gc) if gc else cum.crossJoin(
        F.broadcast(tot)
    )
    picked = (
        j.filter(2 * F.col("_cum") >= F.col("_wtot"))
        .groupBy(*gc, "_wtot")
        .agg(
            F.min(
                F.struct(
                    F.col("_s").alias("s"),
                    F.col("_dy").alias("dy"),
                    F.col("_dx").alias("dx"),
                )
            ).alias("_m")
        )
    )
    return picked.select(
        *gc,
        F.col("_wtot").alias("n_pairs"),
        F.col("_m.dy").alias("slope_dy"),
        F.col("_m.dx").alias("slope_dx"),
        F.col("_m.s").alias("slope"),
    )


def cochran_armitage(
    df: DataFrame,
    dose_col: str,
    flag_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Cochran–Armitage trend test per group — "does the pass rate
    rise MONOTONICALLY with the dose bin" (Cochran 1954, Armitage
    1955): the ordered-category sharpening of the r×2 chi-square,
    the right test when the x-axis is an ordinal bin (quality
    decile, size band, epoch) rather than a free category.

    Doses must be integer scores (the quantization discipline).
    All sufficient statistics are exact int64 sums over the
    ≤|doses| per-group bins: N, R (total positives), Σx·n, Σx·r,
    Σx²·n; the z statistic
        z = (Σxr − (R/N)·Σxn) / √(p(1−p)·(Σx²n − (Σxn)²/N)),
    p = R/N, is a FIXED chain of correctly-rounded IEEE ops (one
    sqrt) over their double images — hash-exact.  Degenerate groups
    (one class, or a single dose level — zero dose variance) yield
    z NULL.

    Plan: one partial-agg'd shuffle to (group, dose) bins, one to
    the group frame.  Returns (group_cols..., n, pos, n_doses,
    sxn, sxr, sxxn, z)."""
    gc = list(group_cols or [])
    bins = (
        df.select(
            *gc,
            F.col(dose_col).cast("long").alias("_x"),
            F.col(flag_col).cast("long").alias("_y"),
        )
        .groupBy(*gc, "_x")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("_y").alias("_r"))
    )
    agg = bins.groupBy(*gc).agg(
        F.sum("_n").alias("n"),
        F.sum("_r").alias("pos"),
        F.count(F.lit(1)).alias("n_doses"),
        F.sum(F.col("_x") * F.col("_n")).alias("sxn"),
        F.sum(F.col("_x") * F.col("_r")).alias("sxr"),
        F.sum(F.col("_x") * F.col("_x") * F.col("_n")).alias("sxxn"),
    )
    nd = F.col("n").cast("double")
    p = F.col("pos").cast("double") / nd
    sxnd = F.col("sxn").cast("double")
    num = F.col("sxr").cast("double") - p * sxnd
    var = p * (F.lit(1.0) - p) * (
        F.col("sxxn").cast("double") - sxnd * sxnd / nd
    )
    return agg.select(
        *gc,
        "n",
        "pos",
        "n_doses",
        "sxn",
        "sxr",
        "sxxn",
        F.when(var > 0, num / F.sqrt(var)).alias("z"),
    )


def anova_oneway(
    df: DataFrame,
    value_col: str,
    group_col: str,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """One-way ANOVA F statistic per partition — the k-group
    generalization completing the two-sample tier (Welch t / MWU /
    KS compare two samples; "does quality score differ ACROSS
    sources" needs all k at once).

    Exactness discipline: values must be pre-quantized integers (the
    spearman/kendall contract).  Per-group sufficient statistics
    (n_g, S_g) and the global squares sum Q are exact int64; the one
    order-sensitive term, A = Σ_g S_g²/n_g, folds over the
    GROUP-KEY-SORTED struct array — a fixed left-to-right IEEE
    chain, so the sum is bit-identical on any engine stating the
    same sorted fold (DuckDB mirrors with
    list_reduce(list_sort(...)); a bare SUM() of doubles would be
    partition-order-dependent and a windowed running sum is
    segment-tree-shaped in some engines).  Then
        SSB = A − S²/N,  SST = Q − S²/N,  SSW = SST − SSB,
        F   = (SSB/(k−1)) / (SSW/(N−k))
    — fixed chains over exact images.  int64→double bound: S_g² and
    Q must stay < 2^53 for exact double images (|y| ≤ 10⁴ and
    N ≤ 10⁸ per partition is safe; past that lift to DECIMAL).
    Degenerate partitions (k < 2, N ≤ k, or SSW = 0) yield f NULL.

    Scale: one partial-agg'd shuffle to (partition, group) cells,
    one to the partition row; the sorted fold runs on a
    |groups|-bounded array per partition (the kendall bounded-
    cardinality contract).  Returns (partition_cols..., k, n,
    ss_between, ss_within, f)."""
    pc = list(partition_cols or [])
    y = F.col(value_col).cast("long")
    cells = (
        df.filter(F.col(value_col).isNotNull() & F.col(group_col).isNotNull())
        .select(*pc, F.col(group_col).alias("_g"), y.alias("_y"))
        .groupBy(*pc, "_g")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_y").alias("_s"),
            F.sum(F.col("_y") * F.col("_y")).alias("_q"),
        )
    )
    agg = cells.groupBy(*pc).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_n").alias("n"),
        F.sum("_s").alias("_S"),
        F.sum("_q").alias("_Q"),
        F.sort_array(
            F.collect_list(F.struct(F.col("_g"), F.col("_s"), F.col("_n")))
        ).alias("_ga"),
    )
    a = F.aggregate(
        F.col("_ga"),
        F.lit(0.0),
        lambda acc, x: acc
        + (x["_s"] * x["_s"]).cast("double") / x["_n"].cast("double"),
    )
    sd = F.col("_S").cast("double")
    nd = F.col("n").cast("double")
    ssb = a - sd * sd / nd
    sst = F.col("_Q").cast("double") - sd * sd / nd
    ssw = sst - ssb
    f = (ssb / (F.col("k") - 1).cast("double")) / (
        ssw / (F.col("n") - F.col("k")).cast("double")
    )
    return agg.select(
        *pc,
        "k",
        "n",
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        F.when(
            (F.col("k") > 1) & (F.col("n") > F.col("k")) & (ssw > 0), f
        ).alias("f"),
    )


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Kruskal–Wallis H per partition (Kruskal & Wallis 1952) — the
    rank-based k-group one-way ANOVA: `mann_whitney_u`'s k-group
    generalization the way `anova_oneway` generalizes Welch t, for
    "does the value DISTRIBUTION differ across k sources" without
    the normality assumption.

    Integer-exact core: values pre-quantized to integers (the
    spearman contract); average ranks scale ×2 into exact int64 over
    the distinct-value spine (tie-run average is a half-integer);
    per-group doubled-rank totals R2_g are exact int64; the cubic
    terms Σ(t³−t), n³−n and n(n+1) run in DECIMAL(38,0) (int64 t³
    would silently wrap at t ≥ 2,097,152 — below the N bound, so
    int64 was never safe there).  With A = Σ_g R2_g²/n_g — folded
    over the
    group-key-SORTED struct array (the anova_oneway fixed IEEE-order
    rule; R2_g casts to double exactly below 2^53, i.e.
    N < 6.7·10⁷ rows per partition) —
        H  = 3·A/(N(N+1)) − 3(N+1),
        C  = 1 − Σ(t³−t)/(N³−N)    (tie correction),
        Hc = H / C
    — fixed chains over exact images, hash-exact cross-engine.
    Degenerate partitions (k < 2, or all values tied: C = 0) yield
    NULL h_corrected.

    Scale: one shuffle to (partition, value) spine cells with a
    bounded cumulative window (the `_two_sample_spine` shape), one
    to (partition, group) rank totals, sorted fold on a
    |groups|-bounded array.  Returns (partition_cols..., k, n,
    h, tie_correction, h_corrected)."""
    from pyspark.sql import Window

    pc = list(partition_cols or [])
    base = (
        df.filter(F.col(value_col).isNotNull() & F.col(group_col).isNotNull())
        .select(
            *pc,
            F.col(group_col).alias("_g"),
            F.col(value_col).cast("long").alias("_v"),
        )
    )
    cells = base.groupBy(*pc, "_v", "_g").agg(F.count(F.lit(1)).alias("_c"))
    from hadron_spark.operators.ops import pin

    cells = pin(cells)
    spine = cells.groupBy(*pc, "_v").agg(F.sum("_c").alias("_t"))
    # doubled average rank of a tie run ending at cum: 2·(cum−t)+t+1
    if pc:
        w = (
            Window.partitionBy(*pc)
            .orderBy("_v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        spine = spine.withColumn(
            "_r2", 2 * (F.sum("_t").over(w) - F.col("_t")) + F.col("_t") + 1
        )
    else:
        # a global spine would put the cumulative window on a single
        # partition — route through range_cumsum's banded two-pass
        # instead (spine rows are |distinct quantized values|-bounded,
        # but the banded form holds at ANY cardinality)
        from hadron_spark.operators.ops import range_cumsum

        spine = range_cumsum(
            spine,
            key=F.col("_v"),
            val=F.col("_t"),
            order=[F.col("_v")],
            out_col="_cum",
            inclusive=True,
        ).withColumn(
            "_r2", 2 * (F.col("_cum") - F.col("_t")) + F.col("_t") + 1
        ).drop("_cum")
    ranked = cells.join(spine.select(*pc, "_v", "_r2"), [*pc, "_v"])
    grp = ranked.groupBy(*pc, "_g").agg(
        F.sum("_c").alias("_n"),
        F.sum(F.col("_c") * F.col("_r2")).alias("_R2"),
    )
    # t³ in int64 silently wraps at t ≥ 2,097,152 (2^63 < t³) — far below
    # the docstring's N bound — so the tie sum runs in DECIMAL(38,0)
    # (exact to 10^38; the final cast to double is correctly rounded)
    t_dec = F.col("_t").cast("decimal(38,0)")
    ties = spine.groupBy(*pc).agg(
        F.sum(t_dec * t_dec * t_dec - t_dec).alias("_tsum")
    )
    agg = grp.groupBy(*pc).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_n").alias("n"),
        F.sort_array(
            F.collect_list(F.struct(F.col("_g"), F.col("_R2"), F.col("_n")))
        ).alias("_ga"),
    )
    if pc:
        agg = agg.join(ties, pc)
    else:
        agg = agg.crossJoin(F.broadcast(ties))
    a = F.aggregate(
        F.col("_ga"),
        F.lit(0.0),
        lambda acc, x: acc
        + x["_R2"].cast("double")
        * x["_R2"].cast("double")
        / x["_n"].cast("double"),
    )
    nd = F.col("n").cast("double")
    # n(n+1) and n³−n likewise run in DECIMAL(38,0): int64 n³ wraps at
    # n ≥ 2,097,152 rows per partition (silently with ANSI off), n(n+1)
    # at n ≥ ~3·10⁹ — both far below the R2→double 2^53 bound that
    # actually limits hash-exactness (N < 6.7·10⁷)
    n_dec = F.col("n").cast("decimal(38,0)")
    h = F.lit(3.0) * a / (n_dec * (n_dec + 1)).cast("double") - (
        F.lit(3.0) * (nd + F.lit(1.0))
    )
    # N = 1 makes N³−N zero — ANSI raises on double zero-division,
    # so the guard must wrap the division itself, not just the output
    c = F.when(
        F.col("n") > 1,
        F.lit(1.0)
        - F.col("_tsum").cast("double")
        / (n_dec * n_dec * n_dec - n_dec).cast("double"),
    )
    return agg.select(
        *pc,
        "k",
        "n",
        h.alias("h"),
        c.alias("tie_correction"),
        F.when((F.col("k") > 1) & (c > 0), h / c).alias("h_corrected"),
    )


def brown_forsythe(
    df: DataFrame,
    value_col: str,
    group_col: str,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Brown–Forsythe variance-homogeneity test per partition (Brown
    & Forsythe 1974): the robust Levene variant — one-way ANOVA on
    the absolute deviations from each group's MEDIAN — answering
    "may I pool variances across these k groups at all", the
    admissibility check in front of `anova_oneway`.

    Exactness: with integer values (the spearman contract), a group
    median is a half-integer, so z = |2y − 2·median_g| is an EXACT
    int64 (the mad_outliers ×2 trick) and the whole statistic
    inherits `anova_oneway`'s sorted-fold hash-exactness verbatim —
    the F here is literally anova_oneway(z).  Note the output F is
    computed on the DOUBLED deviations; F is scale-invariant
    (numerator and denominator both carry the 4×), so the statistic
    equals the textbook value exactly.

    Plan: one grouped exact median pass broadcast back onto the scan
    (the mad_outliers shape), then anova_oneway's two aggregations.
    Returns (partition_cols..., k, n, ss_between, ss_within, f)."""
    pc = list(partition_cols or [])
    y = F.col(value_col).cast("long")
    q = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(*pc, F.col(group_col).alias("_g"), y.alias("_y"))
    med = q.groupBy(*pc, "_g").agg(
        F.percentile(F.col("_y") * 2, F.lit(0.5)).alias("_m2")
    )
    z = q.join(F.broadcast(med), [*pc, "_g"]).select(
        *pc,
        "_g",
        F.abs(F.col("_y") * 2 - F.col("_m2").cast("long")).alias("_z"),
    )
    return anova_oneway(z, "_z", "_g", pc)


def friedman(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
) -> DataFrame:
    """Friedman test (Friedman 1937): k treatments scored on the SAME
    n blocks — "do k models rank differently over the same documents"
    (the ordinal-score, k-way member of the paired kit next to
    `mcnemar`), or any repeated-measures one-way design.  Ranks are
    computed WITHIN each block, so between-block scale differences
    never leak into the statistic.

    Exactness: values integer (the spearman contract).  Doubled
    within-block average ranks ρ = 2·RANK + t_eq − 1 are exact int64
    (RANK = min rank of the tie run, t_eq its size — both window
    counts over the block partition, millions of blocks parallelize
    freely).  With R2_j = Σ_blocks ρ, the tie-corrected statistic in
    doubled-rank form is
        chi2 = (k−1) · Σ_j (R2_j − n(k+1))² / (A2 − n·k·(k+1)²),
        A2   = Σ_ij ρ²,
    numerator summed in DECIMAL(38,0) (exact and order-free — no
    sorted fold needed when every term is an integer) and ONE IEEE
    division at the end — hash-exact.  Kendall's W = chi2/(n(k−1))
    rides along as the effect size.  Blocks missing treatments (or
    duplicating one) are DROPPED and counted; an all-tied design
    (zero denominator) yields NULL chi2.

    Returns one row: (k, n, n_blocks_dropped, chi2, kendall_w)."""
    from pyspark.sql import Window

    base = (
        df.filter(
            F.col(block_col).isNotNull()
            & F.col(treatment_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .select(
            F.col(block_col).alias("_b"),
            F.col(treatment_col).alias("_t"),
            F.col(value_col).cast("long").alias("_y"),
        )
    )
    k_row = base.agg(F.count_distinct("_t").alias("k"))
    # complete blocks: exactly one row per treatment, all k present
    per = base.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_nrow"),
        F.count_distinct("_t").alias("_ntr"),
    )
    per = per.crossJoin(F.broadcast(k_row))
    good = per.filter(
        (F.col("_nrow") == F.col("k")) & (F.col("_ntr") == F.col("k"))
    ).select("_b")
    dropped = per.filter(
        (F.col("_nrow") != F.col("k")) | (F.col("_ntr") != F.col("k"))
    ).agg(F.count(F.lit(1)).alias("n_blocks_dropped"))
    kept = base.join(good, "_b")
    wb = Window.partitionBy("_b").orderBy("_y")
    we = Window.partitionBy("_b", "_y")
    ranked = kept.select(
        "_b",
        "_t",
        (2 * F.rank().over(wb) + F.count(F.lit(1)).over(we) - 1).alias("_r2"),
    )
    tr = ranked.groupBy("_t").agg(F.sum("_r2").alias("_R2"))
    tot = ranked.agg(
        F.count_distinct("_b").alias("n"),
        F.sum(F.col("_r2") * F.col("_r2")).alias("_A2"),
    )
    j = tr.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(k_row))
    dev = (F.col("_R2") - F.col("n") * (F.col("k") + 1)).cast("decimal(38,0)")
    num = j.agg(
        F.sum(dev * dev).alias("_num"),
        F.first("n").alias("n"),
        F.first("k").alias("k"),
        F.first("_A2").alias("_A2"),
    )
    den = (
        F.col("_A2")
        - F.col("n") * F.col("k") * (F.col("k") + 1) * (F.col("k") + 1)
    ).cast("double")
    chi2 = (
        (F.col("k") - 1).cast("double")
        * F.col("_num").cast("double")
        / den
    )
    out = num.crossJoin(F.broadcast(dropped)).select(
        "k",
        "n",
        F.coalesce(F.col("n_blocks_dropped"), F.lit(0)).alias(
            "n_blocks_dropped"
        ),
        F.when((F.col("k") > 1) & (den > 0), chi2).alias("chi2"),
        F.when(
            (F.col("k") > 1) & (den > 0) & (F.col("n") > 0),
            chi2 / (F.col("n") * (F.col("k") - 1)).cast("double"),
        ).alias("kendall_w"),
    )
    return out


def page_trend(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    order: list | None = None,
) -> DataFrame:
    """Page's trend test (Page 1963): the ORDERED-ALTERNATIVE member
    of the repeated-measures kit — `friedman` asks "do k treatments
    differ at all"; Page asks "do they increase in THIS hypothesized
    order", which is the usual question for dose levels, model sizes,
    or checkpoint sequences, and has far more power against it.

        L = Σ_j c_j · R_j      (c_j = hypothesized position 1..k,
                                R_j = treatment j's within-block
                                rank total)
        z = (L − E[L]) / sqrt(Var[L]),
        E[L] = n·k(k+1)²/4,  Var[L] = n·k²(k+1)(k²−1)/144
        (the classic untied null moments — Page's original form;
        large positive z supports the hypothesized ascending order).

    `order` lists the treatments in hypothesized ASCENDING order
    (c_1 smallest); rows whose treatment is not listed are EXCLUDED
    (subset analysis), and block completeness is judged on the
    listed set.  Treatments listed in `order` but ABSENT from the
    data are dropped and the remaining positions renumbered densely
    (1..k over the treatments actually present) — the null moments
    E[L] = n·k(k+1)²/4 and Var[L] assume positions are exactly 1..k,
    so a gapped position set (e.g. order=[a,b,c] with b absent
    giving c∈{1,3}) would silently bias the z statistic.
    `order=None` uses the natural ascending sort of the treatment
    labels.

    Exactness (`friedman`'s doubled-rank machinery verbatim): ranks
    double to exact integers, L2 = Σ c·ρ sums in DECIMAL(38,0), and
    with both sides scaled by 6 the z-score is
        z = (6·L2 − 3·n·k(k+1)²) / sqrt(n·k²(k+1)(k²−1))
    — an all-integer numerator and radicand, ONE sqrt (bit-stable
    per IEEE-754, unlike exp/ln) and ONE division: hash-exact
    cross-engine.  Degenerate designs (k < 2 or n = 0) yield NULL
    l/z.  Returns one row: (k, n, n_blocks_dropped, l, z) with
    l = L in ordinary (undoubled) rank units."""
    from pyspark.sql import Window

    base = (
        df.filter(
            F.col(block_col).isNotNull()
            & F.col(treatment_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .select(
            F.col(block_col).alias("_b"),
            F.col(treatment_col).alias("_t"),
            F.col(value_col).cast("long").alias("_y"),
        )
    )
    if order is not None:
        if len(set(order)) != len(order):
            raise ValueError(f"order has duplicate treatments: {order}")
        cmap = F.create_map(
            *[x for i, t in enumerate(order) for x in (F.lit(t), F.lit(i + 1))]
        )
        base = base.withColumn("_c0", F.element_at(cmap, F.col("_t"))).filter(
            F.col("_c0").isNotNull()
        )
        # densify: a treatment listed in `order` but absent from the
        # data must not leave a gap in the position set (the null
        # moments assume positions are exactly 1..k) — renumber over
        # the positions actually present (k-bounded distinct)
        cpos = (
            base.select("_c0")
            .distinct()
            .withColumn("_c", F.row_number().over(Window.orderBy("_c0")))
        )
        base = base.join(F.broadcast(cpos), "_c0").drop("_c0")
    else:
        # natural label order: position over the k-row distinct
        # treatment set (single-partition window over a k-bounded
        # frame — the PLANLINT bounded-aggregate class)
        tpos = (
            base.select("_t")
            .distinct()
            .withColumn("_c", F.row_number().over(Window.orderBy("_t")))
        )
        base = base.join(F.broadcast(tpos), "_t")
    k_row = base.agg(F.count_distinct("_t").alias("k"))
    per = base.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_nrow"),
        F.count_distinct("_t").alias("_ntr"),
    )
    per = per.crossJoin(F.broadcast(k_row))
    good = per.filter(
        (F.col("_nrow") == F.col("k")) & (F.col("_ntr") == F.col("k"))
    ).select("_b")
    dropped = per.filter(
        (F.col("_nrow") != F.col("k")) | (F.col("_ntr") != F.col("k"))
    ).agg(F.count(F.lit(1)).alias("n_blocks_dropped"))
    kept = base.join(good, "_b")
    wb = Window.partitionBy("_b").orderBy("_y")
    we = Window.partitionBy("_b", "_y")
    ranked = kept.select(
        "_b",
        "_c",
        (2 * F.rank().over(wb) + F.count(F.lit(1)).over(we) - 1).alias("_r2"),
    )
    tot = ranked.agg(
        F.count_distinct("_b").alias("n"),
        F.sum(
            F.col("_c").cast("decimal(38,0)")
            * F.col("_r2").cast("decimal(38,0)")
        ).alias("_L2"),
    )
    j = tot.crossJoin(F.broadcast(k_row)).crossJoin(F.broadcast(dropped))
    n_dec = F.col("n").cast("decimal(38,0)")
    k_dec = F.col("k").cast("decimal(38,0)")
    num = (
        F.lit(6).cast("decimal(38,0)") * F.col("_L2")
        - F.lit(3).cast("decimal(38,0)")
        * n_dec * k_dec * (k_dec + 1) * (k_dec + 1)
    )
    rad = (n_dec * k_dec * k_dec * (k_dec + 1) * (k_dec * k_dec - 1)).cast(
        "double"
    )
    ok = (F.col("k") > 1) & (F.col("n") > 0)
    return j.select(
        "k",
        "n",
        F.coalesce(F.col("n_blocks_dropped"), F.lit(0)).alias(
            "n_blocks_dropped"
        ),
        F.when(ok, F.col("_L2").cast("double") / F.lit(2.0)).alias("l"),
        F.when(ok & (rad > 0), num.cast("double") / F.sqrt(rad)).alias("z"),
    )


def jonckheere_terpstra(
    df: DataFrame,
    value_col: str,
    group_col: str,
    order: list | None = None,
) -> DataFrame:
    """Jonckheere–Terpstra trend test (Jonckheere 1954, Terpstra
    1952): the ordered-alternative test for k INDEPENDENT samples —
    `page_trend`'s sibling (Page needs the same blocks scored under
    every treatment; JT compares disjoint groups, the "do values rise
    with dose level / model size / date bucket" question
    `kruskal_wallis` answers only non-directionally).

        JT = Σ_{i<j} U_ij    (Mann–Whitney count of group-i values
                              below group-j values, ties half)
        z  = (JT − E) / sqrt(Var),  E = (N² − Σ n_i²)/4,
        Var = the Hollander–Wolfe tie-corrected three-term form.

    `order` lists the groups in hypothesized ASCENDING order; rows
    in unlisted groups are EXCLUDED (subset analysis).  `order=None`
    uses the natural ascending sort of group labels.

    Exactness: values integer (the spearman contract).  Doubled
    statistic JT2 = Σ_cells n·(2·below + eq) over the (group, value)
    CELL table — `below`/`eq` come from per-group cumulative windows
    on the shared value spine (windows partition by group: parallel
    across groups, |distinct values|-bounded within, the
    kruskal_wallis spine argument) joined cell-to-earlier-groups on
    the value key.  Every term (JT2, E2 = 2E, the three variance
    numerators/denominators) is an exact DECIMAL(38,0) integer; z is
    three correctly-rounded divisions summed in fixed written order,
    one bit-stable sqrt, one final division of the all-integer
    4-scaled numerator 2·JT2 − (N²−Σn²) — hash-exact cross-engine.
    Degenerate designs yield NULL statistics (jt for k < 2; z for
    k < 2, N < 3, or Var ≤ 0).  Returns one row: (k, n, jt, z)."""
    from pyspark.sql import Window

    base = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("_g"),
            F.col(value_col).cast("long").alias("_y"),
        )
    )
    if order is not None:
        if len(set(order)) != len(order):
            raise ValueError(f"order has duplicate groups: {order}")
        cmap = F.create_map(
            *[x for i, g in enumerate(order) for x in (F.lit(g), F.lit(i + 1))]
        )
        base = base.withColumn("_c", F.element_at(cmap, F.col("_g"))).filter(
            F.col("_c").isNotNull()
        )
    else:
        gpos = (
            base.select("_g")
            .distinct()
            .withColumn("_c", F.row_number().over(Window.orderBy("_g")))
        )
        base = base.join(F.broadcast(gpos), "_g")
    cells = base.groupBy("_c", "_y").agg(F.count(F.lit(1)).alias("_n"))
    from hadron_spark.operators.ops import pin

    cells = pin(cells)
    # every (group, spine value) cell, zero-filled, with the strictly-
    # below cumulative per group
    spine = cells.groupBy("_y").agg(F.sum("_n").alias("_t"))
    groups = cells.select("_c").distinct()
    grid = spine.select("_y").crossJoin(F.broadcast(groups))
    gcells = grid.join(cells, ["_c", "_y"], "left").select(
        "_c", "_y", F.coalesce(F.col("_n"), F.lit(0)).alias("_n")
    )
    wg = (
        Window.partitionBy("_c")
        .orderBy("_y")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gcum = gcells.select(
        "_c",
        "_y",
        "_n",
        F.coalesce(F.sum("_n").over(wg), F.lit(0)).alias("_below"),
    )
    pair = (
        cells.alias("a")
        .join(gcum.alias("e"), on=[F.col("a._y") == F.col("e._y"),
                                   F.col("e._c") < F.col("a._c")])
        .select(
            (
                F.col("a._n").cast("decimal(38,0)")
                * (2 * F.col("e._below") + F.col("e._n")).cast("decimal(38,0)")
            ).alias("_term")
        )
    )
    jt2 = pair.agg(F.coalesce(F.sum("_term"),
                              F.lit(0).cast("decimal(38,0)")).alias("_jt2"))
    gtot = cells.groupBy("_c").agg(F.sum("_n").alias("_ni"))
    ni_dec = F.col("_ni").cast("decimal(38,0)")
    gm = gtot.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_ni").alias("n"),
        F.sum(ni_dec * ni_dec).alias("_sn2"),
        F.sum(ni_dec * (ni_dec - 1) * (2 * ni_dec + 5)).alias("_sn_a"),
        F.sum(ni_dec * (ni_dec - 1) * (ni_dec - 2)).alias("_sn_b"),
        F.sum(ni_dec * (ni_dec - 1)).alias("_sn_c"),
    )
    t_dec = F.col("_t").cast("decimal(38,0)")
    tm = spine.agg(
        F.sum(t_dec * (t_dec - 1) * (2 * t_dec + 5)).alias("_st_a"),
        F.sum(t_dec * (t_dec - 1) * (t_dec - 2)).alias("_st_b"),
        F.sum(t_dec * (t_dec - 1)).alias("_st_c"),
    )
    j = jt2.crossJoin(F.broadcast(gm)).crossJoin(F.broadcast(tm))
    n_dec = F.col("n").cast("decimal(38,0)")
    term1 = (
        (n_dec * (n_dec - 1) * (2 * n_dec + 5) - F.col("_sn_a")
         - F.col("_st_a")).cast("double")
        / F.lit(72.0)
    )
    term2 = (F.col("_sn_b") * F.col("_st_b")).cast("double") / (
        F.lit(36).cast("decimal(38,0)")
        * n_dec * (n_dec - 1) * (n_dec - 2)
    ).cast("double")
    term3 = (F.col("_sn_c") * F.col("_st_c")).cast("double") / (
        F.lit(8).cast("decimal(38,0)") * n_dec * (n_dec - 1)
    ).cast("double")
    # term2/term3 denominators are 0 for n < 3; guard INSIDE the when
    # VALUE branch (kruskal_wallis discipline) so ANSI mode never
    # evaluates the zero-denominator division for degenerate designs —
    # `var > 0` in a predicate would otherwise force term2 eagerly
    var = F.when(F.col("n") >= 3, term1 + term2 + term3)
    # scale by 4: z = (JT − E)/sqrt(V) = (2·JT2 − (N²−Σn²)) / (4·sqrt(V))
    # — an ALL-INTEGER numerator (JT2 = 2·JT, E = (N²−Σn²)/4), so no
    # decimal division enters the chain
    num4 = (
        2 * F.col("_jt2") - (n_dec * n_dec - F.col("_sn2"))
    ).cast("double")
    ok = (F.col("k") > 1) & (F.col("n") >= 3)
    return j.select(
        "k",
        "n",
        F.when(F.col("k") > 1,
               F.col("_jt2").cast("double") / F.lit(2.0)).alias("jt"),
        F.when(ok & (var > 0), num4 / (F.lit(4.0) * F.sqrt(var))).alias("z"),
    )


def dunn_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Dunn's post-hoc test (Dunn 1964): WHICH group pairs differ,
    once `kruskal_wallis` has rejected "no difference anywhere" —
    the standard pairwise follow-up on the same pooled midranks
    (re-running mann_whitney per pair uses pair-local ranks and the
    wrong variance; Dunn's z uses the POOLED ranking and the
    KW tie correction).

        z_ij = (R̄_i − R̄_j) / sqrt((N(N+1)/12 − T/(12(N−1)))
                                     · (1/n_i + 1/n_j)),
        T = Σ(t³−t) over pooled tie runs.

    Exactness (the kruskal_wallis spine verbatim): doubled midranks
    exact, and with Δ = R2_i·n_j − R2_j·n_i the z collapses to
        z = Δ · sqrt(3(N−1) / (n_i·n_j·(n_i+n_j)·A)),
        A = N(N+1)(N−1) − T
    — all-integer Δ and radicand terms in DECIMAL(38,0), ONE inner
    division, ONE bit-stable sqrt, ONE multiply: hash-exact
    cross-engine.  Positive z means group_a ranks higher.  A = 0
    (all values tied) yields NULL z.  One row per unordered pair
    (group_a < group_b) — k(k−1)/2 rows, k-bounded.  Apply your own
    multiple-comparison correction downstream (Bonferroni = compare
    |z| against the k(k−1)/2-adjusted critical value; p-values are
    deliberately not emitted — no erf/exp in the hash-exact tier).
    Returns (group_a, group_b, n_a, n_b, mean_rank_a, mean_rank_b,
    z)."""
    from pyspark.sql import Window

    base = (
        df.filter(F.col(value_col).isNotNull() & F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("_g"),
            F.col(value_col).cast("long").alias("_v"),
        )
    )
    cells = base.groupBy("_g", "_v").agg(F.count(F.lit(1)).alias("_c"))
    from hadron_spark.operators.ops import pin, range_cumsum

    cells = pin(cells)
    spine = cells.groupBy("_v").agg(F.sum("_c").alias("_t"))
    spine = range_cumsum(
        spine,
        key=F.col("_v"),
        val=F.col("_t"),
        order=[F.col("_v")],
        out_col="_cum",
        inclusive=True,
    ).withColumn(
        "_r2", 2 * (F.col("_cum") - F.col("_t")) + F.col("_t") + 1
    )
    grp = (
        cells.join(spine.select("_v", "_r2"), "_v")
        .groupBy("_g")
        .agg(
            F.sum("_c").alias("_n"),
            F.sum(F.col("_c") * F.col("_r2")).alias("_R2"),
        )
    )
    t_dec = F.col("_t").cast("decimal(38,0)")
    tot = spine.agg(
        F.sum("_t").alias("n"),
        F.sum(t_dec * t_dec * t_dec - t_dec).alias("_T"),
    )
    a = grp.select(
        F.col("_g").alias("group_a"),
        F.col("_n").alias("n_a"),
        F.col("_R2").alias("_R2a"),
    )
    b = grp.select(
        F.col("_g").alias("group_b"),
        F.col("_n").alias("n_b"),
        F.col("_R2").alias("_R2b"),
    )
    pairs = a.join(
        F.broadcast(b), F.col("group_a") < F.col("group_b")
    ).crossJoin(F.broadcast(tot))
    n_dec = F.col("n").cast("decimal(38,0)")
    na = F.col("n_a").cast("decimal(38,0)")
    nb = F.col("n_b").cast("decimal(38,0)")
    delta = (
        F.col("_R2a").cast("decimal(38,0)") * nb
        - F.col("_R2b").cast("decimal(38,0)") * na
    )
    big_a = n_dec * (n_dec + 1) * (n_dec - 1) - F.col("_T")
    rad = (
        (F.lit(3).cast("decimal(38,0)") * (n_dec - 1)).cast("double")
        / (na * nb * (na + nb) * big_a).cast("double")
    )
    return pairs.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        (F.col("_R2a").cast("double")
         / (F.lit(2.0) * F.col("n_a").cast("double"))).alias("mean_rank_a"),
        (F.col("_R2b").cast("double")
         / (F.lit(2.0) * F.col("n_b").cast("double"))).alias("mean_rank_b"),
        F.when(
            big_a > 0, delta.cast("double") * F.sqrt(rad)
        ).alias("z"),
    )


def cliffs_delta(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Cliff's delta per group pair (Cliff 1993): the EFFECT SIZE the
    rank tests deliberately don't report — δ = P(y_b > y_a) −
    P(y_a > y_b) over all cross-group pairs, in [−1, 1], reading
    "how often does a b-draw beat an a-draw" (δ for two groups is
    the rank-biserial correlation; |δ| ≳ 0.33/0.47 are the
    conventional medium/large lines).  Significance says a
    difference EXISTS (`mann_whitney_u`/`dunn_test`); δ says whether
    it's big enough to matter — at corpus-scale n everything is
    significant, so this is the number that actually gates
    decisions.

    Exactness: with GT = #(y_b > y_a) and EQ = #(y_b = y_a) cross
    pairs — both exact integers off the (group, value) cell table
    via per-group spine cumulatives (the jonckheere_terpstra
    machinery; never an all-pairs join) —
        δ = (2·GT + EQ − n_a·n_b) / (n_a·n_b)
    is ONE IEEE division of exact DECIMAL(38,0) integers:
    hash-exact.  Positive δ means group_b (the later label)
    stochastically dominates.  Returns one row per unordered pair
    (group_a < group_b): (group_a, group_b, n_a, n_b, delta)."""
    from pyspark.sql import Window

    base = (
        df.filter(F.col(value_col).isNotNull() & F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("_g"),
            F.col(value_col).cast("long").alias("_y"),
        )
    )
    cells = base.groupBy("_g", "_y").agg(F.count(F.lit(1)).alias("_n"))
    from hadron_spark.operators.ops import pin

    cells = pin(cells)
    spine = cells.select("_y").distinct()
    groups = cells.select("_g").distinct()
    grid = spine.crossJoin(F.broadcast(groups))
    gcells = grid.join(cells, ["_g", "_y"], "left").select(
        "_g", "_y", F.coalesce(F.col("_n"), F.lit(0)).alias("_n")
    )
    wg = (
        Window.partitionBy("_g")
        .orderBy("_y")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gcum = gcells.select(
        F.col("_g").alias("_ga"),
        "_y",
        F.col("_n").alias("_eq"),
        F.coalesce(F.sum("_n").over(wg), F.lit(0)).alias("_below"),
    )
    # direction: b-side cells against a-side cumulatives, a < b by label
    terms = (
        cells.alias("b")
        .join(gcum.alias("a"), on=[F.col("b._y") == F.col("a._y"),
                                   F.col("a._ga") < F.col("b._g")])
        .groupBy(
            F.col("a._ga").alias("group_a"), F.col("b._g").alias("group_b")
        )
        .agg(
            F.sum(
                F.col("b._n").cast("decimal(38,0)")
                * F.col("a._below").cast("decimal(38,0)")
            ).alias("_gt"),
            F.sum(
                F.col("b._n").cast("decimal(38,0)")
                * F.col("a._eq").cast("decimal(38,0)")
            ).alias("_eqs"),
        )
    )
    gtot = cells.groupBy("_g").agg(F.sum("_n").alias("_ng"))
    na = gtot.select(F.col("_g").alias("group_a"), F.col("_ng").alias("n_a"))
    nb = gtot.select(F.col("_g").alias("group_b"), F.col("_ng").alias("n_b"))
    out = terms.join(F.broadcast(na), "group_a").join(F.broadcast(nb), "group_b")
    prod = (
        F.col("n_a").cast("decimal(38,0)") * F.col("n_b").cast("decimal(38,0)")
    )
    return out.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        (
            (2 * F.col("_gt") + F.col("_eqs") - prod).cast("double")
            / prod.cast("double")
        ).alias("delta"),
    )


def poisson1_cdf_thresholds(max_k: int = 13) -> list[float]:
    """Poisson(1) CDF values P(X ≤ k) for k = 0..max_k−1 — the
    literal inverse-CDF table `bootstrap_ci_mean` compares its hash
    uniforms against.  Exposed so oracle SQL can embed the IDENTICAL
    double literals (repr round-trips)."""
    import math

    out, acc, term = [], 0.0, math.exp(-1.0)
    for k in range(max_k):
        acc += term
        out.append(acc)
        term = term / (k + 1)
    return out


def bootstrap_ci_mean(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_boot: int = 200,
    alpha: float = 0.05,
    seed: int = 42,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Percentile bootstrap CI for the mean — the POISSON bootstrap
    (Chamandy et al. 2012, Google's resampling-at-scale form):
    classic resampling indexes rows with replacement, which cannot be
    expressed as a scan; instead every row enters replicate r with an
    independent Poisson(1) weight, which preserves the bootstrap
    distribution at corpus scale and is one partial-agg'd pass.

    Fully DETERMINISTIC and hash-exact, no RNG state:
      u  = first 13 md5 hex digits of (id, replicate, seed) / 2^52
           (52 uniform bits, exactly representable);
      w  = Poisson(1) inverse CDF at u via LITERAL thresholds
           (`poisson1_cdf_thresholds` — the e^{-1}Σ1/i! constants are
           compile-time literals, so no exp() runs anywhere);
      per replicate: mean_r = Σw·y / Σw — both exact int64 (values
           integer, the spearman contract), ONE division;
      CI = percentile_disc over the ≤ n_boot sorted replicate means,
           indices computed as INTEGER ceil((B·num)/den) with
           alpha/2 pre-converted to a fraction on the driver (a
           float 0.025·B product can round the wrong side).

    Cost: n_boot × the scan (the explode), collapsed map-side to
    |groups|·n_boot rows — linear in n_boot by design; 100–200
    replicates is standard.  Replicates whose total weight is 0
    (only possible for tiny groups) are dropped from the percentile
    (B_eff < n_boot).  Returns (group_cols..., n, mean, n_boot_eff,
    ci_lo, ci_hi)."""
    from fractions import Fraction

    if n_boot < 1:
        raise ValueError(f"n_boot must be >= 1, got {n_boot}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    gc = list(group_cols or [])
    frac = Fraction(alpha / 2).limit_denominator(10**6)
    lo_num, lo_den = frac.numerator, frac.denominator

    base = df.filter(
        F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        *gc,
        F.col(id_col).cast("string").alias("_id"),
        F.col(value_col).cast("long").alias("_y"),
    )
    overall = base.groupBy(*gc).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("_y").cast("double") / F.count(F.lit(1)).cast("double")
         ).alias("mean"),
    )
    rep = base.withColumn(
        "_r", F.explode(F.sequence(F.lit(1), F.lit(int(n_boot))))
    )
    reps = (
        rep.withColumn("_w", _poisson_bootstrap_weight("_id", "_r", seed))
        .groupBy(*gc, "_r")
        .agg(
            F.sum("_w").alias("_sw"),
            F.sum(F.col("_w") * F.col("_y")).alias("_swy"),
        )
        .filter(F.col("_sw") > 0)
        .select(
            *gc,
            (F.col("_swy").cast("double") / F.col("_sw").cast("double")
             ).alias("_m"),
        )
    )
    agg = reps.groupBy(*gc).agg(
        F.count(F.lit(1)).alias("n_boot_eff"),
        F.sort_array(F.collect_list("_m")).alias("_ms"),
    )
    # ceil((B·num)/den) in INTEGER div — a float 0.025·B can land on
    # the wrong side of an integer boundary
    lo_i = F.greatest(
        F.lit(1).cast("long"),
        F.expr(
            f"(n_boot_eff * {lo_num} + {lo_den - 1}) div {lo_den}"
        ),
    )
    hi_i = F.least(
        F.col("n_boot_eff").cast("long"),
        F.expr(
            f"(n_boot_eff * {lo_den - lo_num} + {lo_den - 1}) div {lo_den}"
        ),
    )
    ci = agg.select(
        *gc,
        "n_boot_eff",
        F.element_at("_ms", lo_i.cast("int")).alias("ci_lo"),
        F.element_at("_ms", hi_i.cast("int")).alias("ci_hi"),
    )
    if gc:
        return overall.join(ci, gc).select(
            *gc, "n", "mean", "n_boot_eff", "ci_lo", "ci_hi"
        )
    return overall.crossJoin(F.broadcast(ci)).select(
        "n", "mean", "n_boot_eff", "ci_lo", "ci_hi"
    )


def _poisson_bootstrap_weight(id_col: str, r_col: str, seed: int):
    """The deterministic Poisson(1) replicate weight shared by the
    bootstrap_ci_* family: u = first 13 md5 hex digits of
    (id, replicate, seed) / 2^52 (52 exactly-representable uniform
    bits), then the inverse CDF via the LITERAL thresholds of
    `poisson1_cdf_thresholds` — no exp() or RNG state anywhere, so
    any engine embedding the same literals replays the same weights."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col(id_col), F.col(r_col).cast("string"),
                        F.lit(str(int(seed))),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long").cast("double")
        / F.lit(4503599627370496.0)  # 2^52
    )
    thresholds = poisson1_cdf_thresholds()
    w = F.lit(len(thresholds))
    for k in range(len(thresholds) - 1, -1, -1):
        w = F.when(u < F.lit(thresholds[k]), F.lit(k)).otherwise(w)
    return w.cast("long")


def bootstrap_ci_median(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_boot: int = 200,
    alpha: float = 0.05,
    seed: int = 42,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Percentile bootstrap CI for the MEDIAN — the robust tier's own
    preferred location finally gets an interval (`bootstrap_ci_mean`
    covers means; `mad_outliers` / winsorized_mean center on medians
    with no uncertainty statement).  Same deterministic Poisson(1)
    machinery (Chamandy et al. 2012; see `bootstrap_ci_mean` for the
    md5-uniform + literal-threshold construction), different
    per-replicate statistic:

        median_r = weighted LOWER median of the value CELLS under
                   the replicate's Poisson weights — the smallest
                   value v with 2·cumweight(≤ v) ≥ Σw

    computed entirely on (group, replicate, value)-cell counts: the
    value-cell contract (`theil_sen_slope` / q282's) bounds the
    frame at |groups| · n_boot · |distinct values|, so nothing here
    scans row-level data more than the ONE weighted-cell pass.  The
    lower-median convention keeps every statistic an actual data
    value — all outputs are exact BIGINTs, hash-exact cross-engine
    with zero float steps (the mean variant needs one division; the
    median needs none).  Zero-total-weight replicates (tiny groups
    only) are dropped (n_boot_eff < n_boot).  CI indices are the
    same integer ceil((B·num)/den) percentile_disc discipline.
    Returns (group_cols..., n, median, n_boot_eff, ci_lo, ci_hi)."""
    from fractions import Fraction

    from pyspark.sql import Window

    if n_boot < 1:
        raise ValueError(f"n_boot must be >= 1, got {n_boot}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    gc = list(group_cols or [])
    frac = Fraction(alpha / 2).limit_denominator(10**6)
    lo_num, lo_den = frac.numerator, frac.denominator

    base = df.filter(
        F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        *gc,
        F.col(id_col).cast("string").alias("_id"),
        F.col(value_col).cast("long").alias("_y"),
    )
    # overall lower median per group via the same cumulative trick
    # (weight 1 per row), on value cells
    ocells = base.groupBy(*gc, "_y").agg(F.count(F.lit(1)).alias("_c"))
    wo = (
        Window.partitionBy(*gc).orderBy("_y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ocum = ocells.select(
        *gc, "_y",
        F.sum("_c").over(wo).alias("_cum"),
        F.sum("_c").over(Window.partitionBy(*gc)).alias("_n"),
    )
    overall = ocum.filter(2 * F.col("_cum") >= F.col("_n")).groupBy(*gc).agg(
        F.max("_n").alias("n"),
        F.min("_y").alias("median"),
    )
    rep = base.withColumn(
        "_r", F.explode(F.sequence(F.lit(1), F.lit(int(n_boot))))
    ).withColumn("_w", _poisson_bootstrap_weight("_id", "_r", seed))
    cells = rep.groupBy(*gc, "_r", "_y").agg(F.sum("_w").alias("_cw"))
    wr = (
        Window.partitionBy(*gc, "_r").orderBy("_y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.select(
        *gc, "_r", "_y",
        F.sum("_cw").over(wr).alias("_cum"),
        F.sum("_cw").over(Window.partitionBy(*gc, "_r")).alias("_sw"),
    )
    meds = (
        cum.filter((F.col("_sw") > 0) & (2 * F.col("_cum") >= F.col("_sw")))
        .groupBy(*gc, "_r")
        .agg(F.min("_y").alias("_m"))
    )
    agg = meds.groupBy(*gc).agg(
        F.count(F.lit(1)).alias("n_boot_eff"),
        F.sort_array(F.collect_list("_m")).alias("_ms"),
    )
    lo_i = F.greatest(
        F.lit(1).cast("long"),
        F.expr(f"(n_boot_eff * {lo_num} + {lo_den - 1}) div {lo_den}"),
    )
    hi_i = F.least(
        F.col("n_boot_eff").cast("long"),
        F.expr(
            f"(n_boot_eff * {lo_den - lo_num} + {lo_den - 1}) div {lo_den}"
        ),
    )
    ci = agg.select(
        *gc,
        "n_boot_eff",
        F.element_at("_ms", lo_i.cast("int")).alias("ci_lo"),
        F.element_at("_ms", hi_i.cast("int")).alias("ci_hi"),
    )
    if gc:
        return overall.join(ci, gc).select(
            *gc, "n", "median", "n_boot_eff", "ci_lo", "ci_hi"
        )
    return overall.crossJoin(F.broadcast(ci)).select(
        "n", "median", "n_boot_eff", "ci_lo", "ci_hi"
    )


def conover_iman(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Conover-Iman post-hoc test (Conover & Iman 1979; Conover 1999
    §5.2): `dunn_test`'s t-distributed companion — the pairwise
    follow-up the standard Kruskal-Wallis workflow reaches for when
    Dunn's normal approximation is too conservative (the t form
    conditions on the realized rank variance, giving uniformly more
    power at the same familywise level).

        t_ij = (R̄_i − R̄_j) / sqrt(S²·(N−1−H)/(N−k)·(1/n_i + 1/n_j)),
        S² = (ΣR(x)² − N(N+1)²/4)/(N−1),  H = the tie-corrected KW
        statistic on the same pooled midranks.

    Exactness: the (N−1−H) and S² factors CANCEL algebraically
    against each other — with doubled midranks ρ = 2R (exact
    integers), Δ = R2_i·n_j − R2_j·n_i, Q2 = Σρ² and
    G2 = Σ_g R2_g²/n_g, the statistic collapses to

        t = Δ · sqrt((N − k) / (n_i·n_j·(n_i+n_j)·(Q2 − G2)))

    — Δ, Q2 and every n product exact integers in DECIMAL(38,0);
    G2 is the ONE float sum, computed as the kruskal_wallis
    sorted-fold (deterministic order, mirrored verbatim by the
    oracle's list_reduce(list_sort)); then one subtraction, one
    division, one bit-stable sqrt, one multiply: hash-exact
    cross-engine.  Positive t means group_a ranks higher.  Degenerate
    designs (N ≤ k — every group a single row — or Q2 = G2, all
    values tied) yield NULL t.  One row per unordered pair
    (group_a < group_b), k-bounded.  Compare |t| against the
    t_{N−k} critical value downstream (p-values deliberately not
    emitted — no incomplete-beta in the hash-exact tier).  Returns
    (group_a, group_b, n_a, n_b, mean_rank_a, mean_rank_b, t)."""
    base = (
        df.filter(F.col(value_col).isNotNull() & F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("_g"),
            F.col(value_col).cast("long").alias("_v"),
        )
    )
    cells = base.groupBy("_g", "_v").agg(F.count(F.lit(1)).alias("_c"))
    from hadron_spark.operators.ops import pin, range_cumsum

    cells = pin(cells)
    spine = cells.groupBy("_v").agg(F.sum("_c").alias("_t"))
    spine = range_cumsum(
        spine,
        key=F.col("_v"),
        val=F.col("_t"),
        order=[F.col("_v")],
        out_col="_cum",
        inclusive=True,
    ).withColumn(
        "_r2", 2 * (F.col("_cum") - F.col("_t")) + F.col("_t") + 1
    )
    ranked = cells.join(spine.select("_v", "_r2"), "_v")
    grp = ranked.groupBy("_g").agg(
        F.sum("_c").alias("_n"),
        F.sum(F.col("_c") * F.col("_r2")).alias("_R2"),
    )
    c_dec = F.col("_c").cast("decimal(38,0)")
    r2_dec = F.col("_r2").cast("decimal(38,0)")
    q2 = ranked.agg(F.sum(c_dec * r2_dec * r2_dec).alias("_Q2"))
    g2_fold = F.aggregate(
        F.col("_ga"),
        F.lit(0.0),
        lambda acc, x: acc
        + x["_R2"].cast("double")
        * x["_R2"].cast("double")
        / x["_n"].cast("double"),
    )
    tot = (
        grp.groupBy()
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum("_n").alias("n"),
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("_g"), F.col("_R2"), F.col("_n"))
                )
            ).alias("_ga"),
        )
        .select("k", "n", g2_fold.alias("_G2"))
        .crossJoin(F.broadcast(q2))
    )
    a = grp.select(
        F.col("_g").alias("group_a"),
        F.col("_n").alias("n_a"),
        F.col("_R2").alias("_R2a"),
    )
    b = grp.select(
        F.col("_g").alias("group_b"),
        F.col("_n").alias("n_b"),
        F.col("_R2").alias("_R2b"),
    )
    pairs = a.join(
        F.broadcast(b), F.col("group_a") < F.col("group_b")
    ).crossJoin(F.broadcast(tot))
    na = F.col("n_a").cast("decimal(38,0)")
    nb = F.col("n_b").cast("decimal(38,0)")
    delta = (
        F.col("_R2a").cast("decimal(38,0)") * nb
        - F.col("_R2b").cast("decimal(38,0)") * na
    )
    diff = F.col("_Q2").cast("double") - F.col("_G2")
    rad = (F.col("n") - F.col("k")).cast("double") / (
        (na * nb * (na + nb)).cast("double") * diff
    )
    ok = (F.col("k") > 1) & (F.col("n") > F.col("k")) & (diff > 0)
    return pairs.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        (F.col("_R2a").cast("double")
         / (F.lit(2.0) * F.col("n_a").cast("double"))).alias("mean_rank_a"),
        (F.col("_R2b").cast("double")
         / (F.lit(2.0) * F.col("n_b").cast("double"))).alias("mean_rank_b"),
        F.when(ok, delta.cast("double") * F.sqrt(rad)).alias("t"),
    )


def mann_kendall(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Mann–Kendall trend test per group (Mann 1945, Kendall 1975)
    — the nonparametric "is this series drifting" companion to
    `theil_sen_slope`'s "by how much": S = Σ_{t<t'} sgn(y'−y) over
    time-ordered pairs, with the FULL tie-corrected variance for
    ties on BOTH axes (Kendall's §5 formula — the common
    implementation that drops the time-tie terms silently inflates
    z on fixture-resolution timestamps, the page_trend bias class):

        18·n(n−1)(n−2)·Var(S) =
            n(n−1)(n−2)·[n(n−1)(2n+5) − Σt(t−1)(2t+5) − Σu(u−1)(2u+5)]
          + 2·Σt(t−1)(t−2)·Σu(u−1)(u−2)
          + 9(n−2)·Σt(t−1)·Σu(u−1)

    with t over TIME-tie run sizes and u over VALUE-tie run sizes —
    every term an exact integer, run in DECIMAL(38,0) (n⁶ wraps
    int64 at n ≈ 1300; decimal is exact to n < 2·10⁶ rows per
    group).  z carries the continuity correction
    z = (S − sgn(S))/√Var, a fixed IEEE chain (one division of two
    correctly-rounded decimal→double casts, one sqrt) — hash-exact
    cross-engine.

    Same bounded-cell contract as `kendall_tau_b` (which shares the
    pair spine — S here IS its P−Q with x = time): both axes
    quantized, the corpus collapses to (time, value) cells in one
    partial-agg'd shuffle, the pair algebra runs on the bounded
    cell self-join.  Degenerate designs (n < 3, or Var ≤ 0 from an
    all-tied axis) yield z NULL, never a raised division.

    Returns (group_cols..., n, s, tie_time, tie_value, z)."""
    from hadron_spark.operators.ops import pin

    gc = list(group_cols or [])
    cells = pin(
        df.filter(
            F.col(time_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .select(
            *gc,
            F.col(time_col).cast("long").alias("_x"),
            F.col(value_col).cast("long").alias("_y"),
        )
        .groupBy(*gc, "_x", "_y")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    a, b = cells.alias("a"), cells.alias("b")
    cond = F.col("a._x") < F.col("b._x")
    for g in gc:
        cond = cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    prod = F.col("a._c") * F.col("b._c")
    s = (
        a.join(b, cond)
        .groupBy(*[F.col(f"a.{g}").alias(g) for g in gc])
        .agg(
            F.sum(
                F.when(F.col("b._y") > F.col("a._y"), prod)
                .when(F.col("b._y") < F.col("a._y"), -prod)
                .otherwise(0)
            ).alias("s")
        )
    )

    def tie_terms(axis: str, pre: str) -> DataFrame:
        t = F.col("_t").cast("decimal(38,0)")
        return (
            cells.groupBy(*gc, axis)
            .agg(F.sum("_c").alias("_t"))
            .groupBy(*gc)
            .agg(
                F.sum(t * (t - 1) * (2 * t + 5)).alias(f"_{pre}25"),
                F.sum(t * (t - 1) * (t - 2)).alias(f"_{pre}3"),
                F.sum(t * (t - 1)).alias(f"_{pre}2"),
                F.sum(
                    F.expr("_t * (_t - 1) div 2").cast("long")
                ).alias(f"tie_{pre}"),
            )
        )

    n_tot = cells.groupBy(*gc).agg(F.sum("_c").alias("n"))
    tx, ty = tie_terms("_x", "t"), tie_terms("_y", "u")
    if gc:
        j = n_tot.join(s, gc, "left").join(tx, gc).join(ty, gc)
    else:
        j = (
            n_tot.crossJoin(F.broadcast(s))
            .crossJoin(F.broadcast(tx))
            .crossJoin(F.broadcast(ty))
        )
    j = j.withColumn("s", F.coalesce("s", F.lit(0)))
    n = F.col("n").cast("decimal(38,0)")
    var_num = (
        n * (n - 1) * (n - 2)
        * (n * (n - 1) * (2 * n + 5) - F.col("_t25") - F.col("_u25"))
        + 2 * F.col("_t3") * F.col("_u3")
        + 9 * (n - 2) * F.col("_t2") * F.col("_u2")
    )
    var_den = 18 * n * (n - 1) * (n - 2)
    # the when VALUE must own the division (JT n<3 guard class): at
    # n < 3 var_den is 0 and ANSI would raise before the predicate
    var = F.when(
        F.col("n") >= 3,
        var_num.cast("double") / var_den.cast("double"),
    )
    sd = F.col("s").cast("double")
    z = F.when(
        var > 0,
        (sd - F.signum(sd)) / F.sqrt(var),
    )
    return j.select(
        *gc,
        "n",
        "s",
        F.col("tie_t").alias("tie_time"),
        F.col("tie_u").alias("tie_value"),
        z.alias("z"),
    )


def cochran_q(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    flag_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Cochran's Q test per group (Cochran 1950) — k related BINARY
    treatments over matched blocks: "did the same eval prompts
    pass/fail differently across k model checkpoints", the k-way
    generalization of `mcnemar` exactly as `friedman` generalizes
    the paired sign test.  Blocks missing any treatment are dropped
    whole (complete-block design, the McNemar NULL-row discipline);
    all-0 and all-k blocks carry no signal and cancel algebraically
    but are retained in the counts the formula uses.

        Q = (k−1)·(k·ΣG_j² − T²) / (k·T − ΣL_i²)

    with G_j the treatment column sums, L_i the block row sums and
    T = ΣG = ΣL — every term an exact int64 (the numerator's
    k·ΣG² ≤ k·T² wraps only past T ≈ 2·10⁹ rows of successes), so Q
    is ONE division of two correctly-rounded casts: hash-exact.
    Under H₀, Q ~ χ²(k−1).  Degenerate designs (k < 2, or every
    block all-0/all-k making the denominator 0) yield q NULL.

    Plan: one partial-agg'd shuffle onto blocks (row sums + the
    completeness count), treatment sums as a second agg off the
    complete-block frame, both collapsing onto |groups| rows.
    Returns (group_cols..., k, n_blocks, q)."""
    gc = list(group_cols or [])
    base = df.filter(
        F.col(block_col).isNotNull()
        & F.col(treatment_col).isNotNull()
        & F.col(flag_col).isNotNull()
    ).select(
        *gc,
        F.col(block_col).alias("_b"),
        F.col(treatment_col).alias("_t"),
        F.col(flag_col).cast("long").alias("_y"),
    )
    k_df = base.groupBy(*gc).agg(
        F.countDistinct("_t").alias("k")
    )
    rows_ = base.groupBy(*gc, "_b").agg(
        F.count(F.lit(1)).alias("_m"), F.sum("_y").alias("_l")
    )
    complete = (
        rows_.join(k_df, gc)
        if gc
        else rows_.crossJoin(F.broadcast(k_df))
    ).filter(F.col("_m") == F.col("k"))
    blocks = complete.groupBy(*gc).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("_l").alias("_T"),
        F.sum(F.col("_l") * F.col("_l")).alias("_L2"),
    )
    kept = complete.select(*gc, "_b")
    g = (
        base.join(kept, [*gc, "_b"])
        .groupBy(*gc, "_t")
        .agg(F.sum("_y").alias("_g"))
        .groupBy(*gc)
        .agg(F.sum(F.col("_g") * F.col("_g")).alias("_G2"))
    )
    j = blocks.join(g, gc) if gc else blocks.crossJoin(F.broadcast(g))
    j = j.join(k_df, gc) if gc else j.crossJoin(F.broadcast(k_df))
    num = (F.col("k") - 1) * (
        F.col("k") * F.col("_G2") - F.col("_T") * F.col("_T")
    )
    den = F.col("k") * F.col("_T") - F.col("_L2")
    q = F.when(
        (F.col("k") > 1) & (den > 0),
        num.cast("double") / den.cast("double"),
    )
    return j.select(*gc, "k", "n_blocks", q.alias("q"))


def mood_median_test(
    df: DataFrame,
    value_col: str,
    treatment_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Mood's median test per group (Mood 1950) — k-sample location
    test on counts above/not-above the POOLED grand median: cruder
    than `kruskal_wallis` (it bins each observation to one bit) but
    immune to unequal spreads and the right sanity check when the
    KW rank assumptions are in doubt.

    The grand median is the LOWER weighted median over value CELLS
    (smallest value with 2·cum ≥ n — an actual data value, the
    q298/q326 convention, so the split is exact integers with zero
    float steps).  The statistic is the Pearson χ² over the k×2
    table of (above, not-above) counts:

        chi2 = Σ_j (a_j − n_j·A/N)²/(n_j·A/N)
             + (b_j − n_j·B/N)²/(n_j·B/N)
             = N²/(A·B) · Σ_j (a_j − n_j·A/N)²/n_j
             = N/(A·B) · [ N·Σ_j a_j²/n_j − A² ] ... kept in the
    exact-integer form N·(N·Σa²·/n_j − A²)/(A·B) with the Σ over
    a sorted fold of per-treatment exact terms — the j-sum divides
    by n_j so each term is ONE IEEE division, summed in sorted
    treatment order (the kruskal G2 discipline): hash-exact.
    Under H₀, chi2 ~ χ²(k−1).  Degenerate splits (A = 0 or B = 0 —
    every value on one side of the median) yield chi2 NULL.

    Plan: one shuffle to value cells, one bounded cumulative window
    for the median, one partial-agg'd shuffle onto treatments.
    Returns (group_cols..., k, n, grand_median, chi2)."""
    from pyspark.sql import Window

    gc = list(group_cols or [])
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(treatment_col).isNotNull()
    ).select(
        *gc,
        F.col(treatment_col).alias("_t"),
        F.col(value_col).cast("long").alias("_v"),
    )
    cells = base.groupBy(*gc, "_v").agg(F.count(F.lit(1)).alias("_c"))
    w = (
        Window.partitionBy(*gc)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = cells.groupBy(*gc).agg(F.sum("_c").alias("n"))
    cum = cells.withColumn("_cum", F.sum("_c").over(w))
    cum = cum.join(tot, gc) if gc else cum.crossJoin(F.broadcast(tot))
    med = (
        cum.filter(2 * F.col("_cum") >= F.col("n"))
        .groupBy(*gc, "n")
        .agg(F.min("_v").alias("grand_median"))
    )
    base_m = (
        base.join(med, gc) if gc else base.crossJoin(F.broadcast(med))
    )
    per_t = base_m.groupBy(*gc, "n", "grand_median", "_t").agg(
        F.count(F.lit(1)).alias("_nj"),
        F.sum(
            F.when(F.col("_v") > F.col("grand_median"), 1).otherwise(0)
        ).alias("_aj"),
    )
    agg = per_t.groupBy(*gc, "n", "grand_median").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_aj").alias("_A"),
        F.sort_array(
            F.collect_list(F.struct("_t", "_aj", "_nj"))
        ).alias("_ta"),
    )
    # Σ_j a_j²/n_j in sorted treatment order — each term one IEEE
    # division over exact longs, folded deterministically (the
    # kruskal G2 sorted-fold discipline)
    sa2 = F.aggregate(
        F.col("_ta"),
        F.lit(0.0),
        lambda acc, x: acc
        + x["_aj"].cast("double")
        * x["_aj"].cast("double")
        / x["_nj"].cast("double"),
    )
    nd = F.col("n").cast("double")
    ad = F.col("_A").cast("double")
    bd = (F.col("n") - F.col("_A")).cast("double")
    chi2 = F.when(
        (F.col("_A") > 0) & (F.col("_A") < F.col("n")) & (F.col("k") > 1),
        nd * (nd * sa2 - ad * ad) / (ad * bd),
    )
    return agg.select(
        *gc, "k", "n", "grand_median", chi2.alias("chi2")
    )


def benjamini_hochberg(
    df: DataFrame,
    p_col: str,
    id_cols: list[str],
    family_cols: list[str] | None = None,
    out_col: str = "p_adj",
) -> DataFrame:
    """Benjamini–Hochberg FDR adjustment per family (Benjamini &
    Hochberg 1995) — the multiple-testing step the post-hoc tier
    (dunn_test / conover_iman / pairwise two_proportion sweeps)
    feeds: rank the family's m p-values ascending, then

        p_adj(i) = min(1, min_{j ≥ i} p(j)·m/j)

    — the step-up running minimum from the largest rank down.
    Each p·m/j is ONE IEEE multiply + divide over the exact rank
    integers; the reverse cumulative MIN and the final cap are
    order-operations, so the whole column is hash-exact given a
    deterministic rank order — ties on p break by `id_cols` (the
    adjusted SET is invariant to tie order, but per-row attribution
    needs the total order pinned for cross-engine identity).

    NULL p-values pass through with NULL p_adj and do NOT count
    toward m (the pairwise-complete discipline).

    Plan: one window pass per family (rank + reverse running min
    over the same sort), no joins; families are independent so the
    window partitions by them — bounded frames, no SinglePartition
    when `family_cols` is set.  With no families the single window
    is over m = |tests| rows — the post-hoc tables this adjusts are
    k(k−1)/2-bounded, which is the documented frame contract.
    Returns df's columns + (rank, m, out_col)."""
    from pyspark.sql import Window

    fc = list(family_cols or [])
    ok = df.filter(F.col(p_col).isNotNull())
    nulls = df.filter(F.col(p_col).isNull())
    part = Window.partitionBy(*fc) if fc else Window.partitionBy(F.lit(1))
    order = [F.col(p_col)] + [F.col(c) for c in id_cols]
    w_rank = part.orderBy(*order)
    w_min = part.orderBy(*[o.desc() for o in order]).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = ok.withColumn("rank", F.row_number().over(w_rank)).withColumn(
        "m", F.count(F.lit(1)).over(part.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        ))
    )
    stepped = ranked.withColumn(
        out_col,
        F.least(
            F.lit(1.0),
            F.min(
                F.col(p_col)
                * F.col("m").cast("double")
                / F.col("rank").cast("double")
            ).over(w_min),
        ),
    )
    padded = nulls.select(
        "*",
        F.lit(None).cast("int").alias("rank"),
        F.lit(None).cast("long").alias("m"),
        F.lit(None).cast("double").alias(out_col),
    )
    return stepped.unionByName(padded)


def sign_test(
    df: DataFrame,
    diff_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact two-sided sign test per group (Arbuthnott 1710; the
    oldest test there is) — the sign of `diff_col` is the evidence:
    n_pos ups vs n_neg downs, zeros dropped (the standard
    convention), and the p-value is the EXACT binomial tail

        p = min(1, 2·P(Bin(n, ½) ≤ min(n_pos, n_neg)))

    — no normal approximation.  The tail is a per-row fold over
    i = 1..m: c_i = c_{i−1}·(n−i+1)/i starting from c_0 = 2^{−n}
    (pow(2, −n) is exact — a power of two), each step two
    correctly-rounded IEEE ops in a FIXED order, so the p column is
    hash-exact cross-engine (DuckDB replays the identical fold via
    list_reduce).  For n ≤ 52 every term is a dyadic rational and p
    is EXACT, not just reproducible.  n ≳ 1000 underflows c_0 to
    subnormals — at that size the evidence is overwhelming anyway
    and p degrades gracefully toward 0.

    Feeds `benjamini_hochberg` directly: run one sign test per
    stratum, then adjust the family.

    Plan: one partial-agg'd shuffle onto |groups| rows; the fold is
    a scalar expression over a ≤ min(n_pos,n_neg)-element sequence
    per OUTPUT row, never over data rows.  Returns (group_cols...,
    n, n_pos, n_neg, p); empty groups (all zero diffs) yield p
    NULL."""
    gc = list(group_cols or [])
    agg = (
        df.filter(F.col(diff_col).isNotNull() & (F.col(diff_col) != 0))
        .groupBy(*gc)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col(diff_col) > 0, 1).otherwise(0)
            ).alias("n_pos"),
        )
    )
    m = F.least(F.col("n_pos"), F.col("n") - F.col("n_pos"))
    c0 = F.pow(F.lit(2.0), (-F.col("n")).cast("double"))
    nd = F.col("n").cast("double")
    # fold state [c_i, tail_i]; the c-term is recomputed in both
    # slots — identical expression, identical rounding
    step = lambda acc, i: F.array(  # noqa: E731
        acc[0] * (nd - i.cast("double") + 1) / i.cast("double"),
        acc[1] + acc[0] * (nd - i.cast("double") + 1) / i.cast("double"),
    )
    tail = F.when(
        m >= 1,
        F.aggregate(
            F.sequence(F.lit(1), m.cast("int")),
            F.array(c0, c0),
            step,
        )[1],
    ).otherwise(c0)
    p = F.when(F.col("n") > 0, F.least(F.lit(1.0), 2 * tail))
    return agg.select(
        *gc,
        "n",
        "n_pos",
        (F.col("n") - F.col("n_pos")).alias("n_neg"),
        p.alias("p"),
    )


def cohens_d(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Cohen's d and Hedges' g per group — the parametric effect
    size next to `cliffs_delta`'s ordinal one (and the number the
    q115-style Welch t needs a companion for: t says WHETHER the
    means differ, d says BY HOW MUCH in pooled-SD units):

        d = (m_a − m_b) / s_p,
        s_p² = ((n_a−1)s_a² + (n_b−1)s_b²) / (n_a+n_b−2)

    with Hedges' small-sample correction g = d·(1 − 3/(4·df − 1))
    (the standard Hedges–Olkin approximation of the exact gamma
    factor).  With quantized integer values the sufficient
    statistics are exact (DECIMAL(38,0): (n−1)s² = (nΣx² − (Σx)²)/n
    keeps an exact integer numerator), and every reported number is
    a FIXED chain of correctly-rounded IEEE ops (two mean
    divisions, one sqrt, two divisions): hash-exact.  Degenerate
    designs (df ≤ 0 or zero pooled variance) yield d and g NULL.

    Plan: one partial-agg'd shuffle per side onto |groups| rows,
    one join.  Returns (group_cols..., n_a, n_b, mean_a, mean_b,
    d, g)."""
    gc = list(group_cols or [])

    def side(df: DataFrame, tag: str) -> DataFrame:
        v = F.col(value_col).cast("long")
        vd = v.cast("decimal(38,0)")
        return (
            df.filter(F.col(value_col).isNotNull())
            .groupBy(*gc)
            .agg(
                F.count(F.lit(1)).alias(f"n_{tag}"),
                F.sum(v).alias(f"_s{tag}"),
                F.sum(vd * vd).alias(f"_q{tag}"),
            )
        )
    sa, sb = side(a, "a"), side(b, "b")
    j = sa.join(sb, gc) if gc else sa.crossJoin(F.broadcast(sb))
    na, nb = F.col("n_a"), F.col("n_b")
    # (n−1)s² · n = n·Σx² − (Σx)², exact in decimal
    aa = (
        na.cast("decimal(38,0)") * F.col("_qa")
        - F.col("_sa").cast("decimal(38,0)") * F.col("_sa")
    )
    ab = (
        nb.cast("decimal(38,0)") * F.col("_qb")
        - F.col("_sb").cast("decimal(38,0)") * F.col("_sb")
    )
    ma = F.col("_sa").cast("double") / na.cast("double")
    mb = F.col("_sb").cast("double") / nb.cast("double")
    df_ = na + nb - 2
    sp2 = (
        aa.cast("double") / na.cast("double")
        + ab.cast("double") / nb.cast("double")
    ) / df_.cast("double")
    d = F.when((df_ > 0) & (sp2 > 0), (ma - mb) / F.sqrt(sp2))
    corr = F.lit(1.0) - F.lit(3.0) / (4 * df_ - 1).cast("double")
    g = F.when((df_ > 0) & (sp2 > 0), ((ma - mb) / F.sqrt(sp2)) * corr)
    return j.select(
        *gc,
        "n_a",
        "n_b",
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        d.alias("d"),
        g.alias("g"),
    )


def fisher_exact(
    new: DataFrame,
    old: DataFrame,
    flag_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fisher's EXACT test per group (Fisher 1935) on the 2x2 table
    the two frames induce (successes/failures in `new` vs `old`) —
    the small-sample companion to `two_proportion_test`: when cells
    are single digits the pooled-z normal approximation is folklore,
    the hypergeometric tail is the answer.

        p = Σ_{tables as or more extreme} P(table | margins)

    two-sided by the standard "probability at most that of the
    observed table" rule.  Computed with ZERO factorials: the
    support walks k = kmin..kmax with the pmf RECURRENCE
    u(k+1) = u(k)·(K−k)(n−k)/((k+1)(N−K−n+k+1)) from u(kmin) = 1
    (unnormalized — the comparison and the normalizing sum use the
    same scale, so the normalization constant never appears except
    in the final division).  Every u is a fixed left-to-right
    multiply/divide chain over exact small-int casts, the tail sum
    adds in k order, and p is ONE final division: hash-exact (the
    oracle replays the identical walk via nested list folds).

    SMALL-SAMPLE CONTRACT: the unnormalized weights peak near
    C(N/2, ·) — keep per-group N ≲ 700 (beyond ~10^308 they
    overflow to inf; that regime belongs to `two_proportion_test`
    anyway).  Support size ≤ min(margins), so the per-row fold is
    O(min(margin)²) scalar flops — output-row work, never data-row
    work.

    Returns (group_cols..., k_new, n_new, k_old, n_old, odds_ratio
    — NULL on a zero off-diagonal — and p)."""
    gc = list(group_cols or [])

    def side(df: DataFrame, n: str, k: str) -> DataFrame:
        return (
            df.filter(F.col(flag_col).isNotNull())
            .groupBy(*gc)
            .agg(
                F.count(F.lit(1)).alias(n),
                F.sum(F.col(flag_col).cast("long")).alias(k),
            )
        )

    a_ = side(new, "n_new", "k_new")
    b_ = side(old, "n_old", "k_old")
    j = a_.join(b_, gc) if gc else a_.crossJoin(F.broadcast(b_))
    # hypergeometric frame: N total, K total successes, n draws
    # (= |new|), observed k = k_new
    N = F.col("n_new") + F.col("n_old")
    K = F.col("k_new") + F.col("k_old")
    n = F.col("n_new")
    kmin = F.greatest(F.lit(0).cast("long"), n + K - N)
    kmax = F.least(K, n)
    num = lambda jj: ((K - jj) * (n - jj)).cast("double")  # noqa: E731
    den = lambda jj: (  # noqa: E731
        (jj + 1) * (N - K - n + jj + 1)
    ).cast("double")
    u_at = lambda k: F.when(k == kmin, F.lit(1.0)).otherwise(  # noqa: E731
        F.aggregate(
            F.sequence(kmin, k - 1),
            F.lit(1.0),
            lambda acc, jj: acc * num(jj) / den(jj),
        )
    )
    us = F.transform(F.sequence(kmin, kmax), lambda k: u_at(k))
    j = j.withColumn("_us", us).withColumn(
        "_ua", F.element_at(F.col("_us"), (F.col("k_new") - kmin + 1).cast("int"))
    )
    s = F.aggregate(F.col("_us"), F.lit(0.0), lambda acc, u: acc + u)
    tail = F.aggregate(
        F.col("_us"),
        F.lit(0.0),
        lambda acc, u: acc + F.when(u <= F.col("_ua"), u).otherwise(F.lit(0.0)),
    )
    bq = F.col("n_new") - F.col("k_new")
    cq = F.col("k_old")
    dq = F.col("n_old") - F.col("k_old")
    orat = F.when(
        (bq > 0) & (cq > 0),
        (F.col("k_new") * dq).cast("double") / (bq * cq).cast("double"),
    )
    return j.select(
        *gc,
        "k_new",
        "n_new",
        "k_old",
        "n_old",
        orat.alias("odds_ratio"),
        (tail / s).alias("p"),
    )


def wilcoxon_signed_rank(
    df: DataFrame,
    diff_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Wilcoxon signed-rank test per group (Wilcoxon 1945) — the
    paired nonparametric workhorse between `sign_test` (signs only,
    throws away magnitude) and the paired t (needs normality): rank
    the |differences|, sum the ranks of the positive side, ask if
    the split is lopsided.  Zeros dropped (Wilcoxon's original
    convention, matching `sign_test`).

    Rank algebra exact by the ×2 midrank lift (the mann_whitney_u
    spine): W⁺×2 = Σ_{d>0} cnt·r2 over |d| CELLS is an exact int64,
    and the tie-corrected normal z uses

        z = (W⁺×2 − n(n+1)/2) / √((2n(n+1)(2n+1) − Σ(t³−t)) / 12)

    — numerator and radicand all exact integers (DECIMAL(38,0);
    t³ wraps int64 at 2.1·10⁶ — the kruskal discipline), one
    division + one sqrt: hash-exact.  The radicand is
    3n(n+1)²/12 > 0 even fully tied, so z exists whenever n ≥ 1;
    all-zero-diff groups vanish (no evidence).

    Plan: one shuffle onto |d| cells, one bounded cumulative window
    per group, one partial-agg'd collapse.  Returns (group_cols...,
    n, w_pos_x2, w_neg_x2, tie_term, z)."""
    from pyspark.sql import Window

    gc = list(group_cols or [])
    base = df.filter(
        F.col(diff_col).isNotNull() & (F.col(diff_col) != 0)
    ).select(
        *gc,
        F.abs(F.col(diff_col).cast("long")).alias("_a"),
        (F.col(diff_col) > 0).cast("long").alias("_p"),
    )
    cells = base.groupBy(*gc, "_a").agg(
        F.count(F.lit(1)).alias("_c"), F.sum("_p").alias("_cp")
    )
    w = (
        Window.partitionBy(*(gc or [F.lit(1)]))
        .orderBy("_a")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r2 = 2 * (F.sum("_c").over(w) - F.col("_c")) + F.col("_c") + 1
    ranked = cells.withColumn("_r2", r2)
    t_dec = F.col("_c").cast("decimal(38,0)")
    agg = ranked.groupBy(*gc).agg(
        F.sum("_c").alias("n"),
        F.sum(F.col("_cp") * F.col("_r2")).alias("w_pos_x2"),
        F.sum((F.col("_c") - F.col("_cp")) * F.col("_r2")).alias(
            "w_neg_x2"
        ),
        F.sum(t_dec * t_dec * t_dec - t_dec).alias("_t"),
    )
    n = F.col("n").cast("decimal(38,0)")
    rad = (2 * n * (n + 1) * (2 * n + 1) - F.col("_t")).cast("double") / F.lit(
        12.0
    )
    e2 = (n * (n + 1)).cast("double") / F.lit(2.0)
    z = F.when(
        rad > 0,
        (F.col("w_pos_x2").cast("double") - e2) / F.sqrt(rad),
    )
    agg = agg.filter(F.col("n") > 0)  # empty global agg leaves a NULL row
    return agg.select(
        *gc,
        "n",
        "w_pos_x2",
        "w_neg_x2",
        F.col("_t").cast("long").alias("tie_term"),
        z.alias("z"),
    )


def runs_test(
    df: DataFrame,
    order_col: str,
    sign_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Wald–Wolfowitz runs test per series (1940) — "is this
    sequence of ups/downs RANDOM, or does it streak/alternate":
    the residual-diagnostics companion to `mann_kendall` (which
    asks for monotone drift; this asks for serial dependence of
    ANY sign).  The evidence is the run count R of the ±sequence
    ordered by `order_col` (zeros dropped):

        E[R] = 1 + 2·n₁n₂/n,
        Var  = 2n₁n₂(2n₁n₂ − n) / (n²(n−1))

    — R, n₁, n₂ exact integers off one lag window; z = (R − E)/√Var
    is a fixed chain (two divisions, one sqrt) over DECIMAL(38,0)
    casts: hash-exact.  One-sided-sign or n < 2 series yield z NULL
    (no randomness question to ask).

    Plan: one per-series lag window (bounded series contract — this
    is for residual/metric series), one partial-agg'd collapse.
    Ties in `order_col` are pinned by the sign value.  Returns
    (group_cols..., n, n_pos, n_neg, runs, z)."""
    from pyspark.sql import Window

    gc = list(group_cols or [])
    base = df.filter(
        F.col(sign_col).isNotNull()
        & (F.col(sign_col) != 0)
        & F.col(order_col).isNotNull()
    ).select(
        *gc,
        F.col(order_col).alias("_o"),
        F.signum(F.col(sign_col).cast("double")).cast("int").alias("_s"),
    )
    w = Window.partitionBy(*(gc or [F.lit(1)])).orderBy("_o", "_s")
    stepped = base.withColumn("_prev", F.lag("_s").over(w))
    agg = stepped.groupBy(*gc).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("_s") > 0, 1).otherwise(0)).alias("n_pos"),
        F.sum(
            F.when(
                F.col("_prev").isNull() | (F.col("_s") != F.col("_prev")), 1
            ).otherwise(0)
        ).alias("runs"),
    )
    n = F.col("n").cast("decimal(38,0)")
    n1 = F.col("n_pos").cast("decimal(38,0)")
    n2 = (F.col("n") - F.col("n_pos")).cast("decimal(38,0)")
    two12 = 2 * n1 * n2
    e = F.lit(1.0) + two12.cast("double") / F.col("n").cast("double")
    var = F.when(
        (F.col("n") >= 2)
        & (F.col("n_pos") > 0)
        & (F.col("n_pos") < F.col("n")),
        (two12 * (two12 - n)).cast("double")
        / (n * n * (n - 1)).cast("double"),
    )
    z = F.when(var > 0, (F.col("runs").cast("double") - e) / F.sqrt(var))
    agg = agg.filter(F.col("n") > 0)  # empty global agg leaves a 0 row
    return agg.select(
        *gc,
        "n",
        "n_pos",
        (F.col("n") - F.col("n_pos")).alias("n_neg"),
        "runs",
        z.alias("z"),
    )


def paired_t(
    df: DataFrame,
    diff_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Paired t-test per group — the parametric member of the paired
    kit (sign_test uses signs, wilcoxon_signed_rank uses ranks, this
    uses the magnitudes under normality): t = d̄ / (s_d/√n) over the
    paired differences, df = n − 1.

    With quantized integer diffs the moments are exact
    (DECIMAL(38,0): n·Σd² − (Σd)² is the n·(n−1)·s² integer), and t
    is a FIXED chain — one mean division, one variance division,
    one sqrt, one final division: hash-exact.  NULL diffs are
    excluded; zero-variance or n < 2 groups yield t NULL.

    Plan: one partial-agg'd shuffle onto |groups| rows.  Returns
    (group_cols..., n, mean_diff, t)."""
    gc = list(group_cols or [])
    d = F.col(diff_col).cast("long")
    dd = d.cast("decimal(38,0)")
    agg = (
        df.filter(F.col(diff_col).isNotNull())
        .groupBy(*gc)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(d).alias("_s"),
            F.sum(dd * dd).alias("_q"),
        )
    )
    n = F.col("n")
    nd = n.cast("double")
    mean = F.col("_s").cast("double") / nd
    # n(n−1)s² = n·Σd² − (Σd)², exact
    a = (
        n.cast("decimal(38,0)") * F.col("_q")
        - F.col("_s").cast("decimal(38,0)") * F.col("_s")
    )
    se = F.sqrt(a.cast("double") / (n.cast("decimal(38,0)") * (n - 1)).cast(
        "double"
    ) / nd)
    t = F.when((n >= 2) & (a > 0), mean / se)
    return agg.filter(F.col("n") > 0).select(
        *gc, "n", mean.alias("mean_diff"), t.alias("t")
    )


def ols_fit(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Least-squares fit per group, y ~ 1 + x1 [+ x2] — the
    multiple-regression step beyond `theil_sen_slope`'s single
    robust slope, solved EXACTLY by Cramer's rule on the normal
    equations: every entry of X'X and X'y is an exact integer
    moment (quantize predictors and response — the house contract),
    every determinant is exact DECIMAL(38,0) cofactor algebra, and
    each coefficient is ONE division of two exact determinants:
    hash-exact with zero iterative fitting.

    R² comes from the fixed chain SSE = Σy² − (β₀Σy + β₁Σx₁y
    [+ β₂Σx₂y]) and SST = Σy² − (Σy)²/n (each β-product one IEEE
    multiply, summed in fixed order).  Bounds: determinant terms
    are products of three moments ≈ (n·max|x|²)³ — keep
    n·max(x²) < 10¹² per group (DECIMAL(38,0) headroom), i.e.
    quantize to modest ranges, which is also what keeps the normal
    equations well-conditioned.  Singular designs (det = 0 —
    collinear or constant predictors) yield NULL coefficients.

    Plan: one partial-agg'd shuffle onto |groups| rows; the solve
    is scalar expressions per output row.  Supports 1 or 2
    predictors (the 3×3 Cramer expansion; beyond that use an
    iterative solver, which leaves the hash-exact tier).  Returns
    (group_cols..., n, b0, b1[, b2], r2)."""
    if not 1 <= len(x_cols) <= 2:
        raise ValueError(
            f"ols_fit supports 1 or 2 predictors: {x_cols}"
        )
    gc = list(group_cols or [])
    p = len(x_cols)
    cols = [F.col(c).cast("long") for c in x_cols]
    y = F.col(y_col).cast("long")
    cond = F.col(y_col).isNotNull()
    for c in x_cols:
        cond = cond & F.col(c).isNotNull()
    base = df.filter(cond)
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("_sy"),
        F.sum(d(y) * y).alias("_syy"),
    ]
    for i, xi in enumerate(cols):
        aggs.append(F.sum(xi).alias(f"_s{i}"))
        aggs.append(F.sum(d(xi) * y).alias(f"_s{i}y"))
        for j, xj in enumerate(cols[: i + 1]):
            aggs.append(F.sum(d(xi) * xj).alias(f"_s{i}{j}"))
    agg = base.groupBy(*gc).agg(*aggs)
    n = F.col("n").cast("decimal(38,0)")
    sy = F.col("_sy").cast("decimal(38,0)")
    if p == 1:
        s1, s11 = F.col("_s0").cast("decimal(38,0)"), F.col("_s00")
        s1y = F.col("_s0y")
        det = n * s11 - s1 * s1
        det0 = sy * s11 - s1 * s1y
        det1 = n * s1y - s1 * sy
        b0 = F.when(det != 0, det0.cast("double") / det.cast("double"))
        b1 = F.when(det != 0, det1.cast("double") / det.cast("double"))
        fit_dot = (
            b0 * F.col("_sy").cast("double")
            + b1 * F.col("_s0y").cast("double")
        )
        betas = [b0.alias("b0"), b1.alias("b1")]
    else:
        s1 = F.col("_s0").cast("decimal(38,0)")
        s2 = F.col("_s1").cast("decimal(38,0)")
        s11, s12, s22 = F.col("_s00"), F.col("_s10"), F.col("_s11")
        s1y, s2y = F.col("_s0y"), F.col("_s1y")

        def det3(a, b_, c, dd, e, f_, g_, h, i_):
            return a * (e * i_ - f_ * h) - b_ * (dd * i_ - f_ * g_) + c * (
                dd * h - e * g_
            )

        det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
        det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
        det1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
        det2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
        b0 = F.when(det != 0, det0.cast("double") / det.cast("double"))
        b1 = F.when(det != 0, det1.cast("double") / det.cast("double"))
        b2 = F.when(det != 0, det2.cast("double") / det.cast("double"))
        fit_dot = (
            b0 * F.col("_sy").cast("double")
            + b1 * F.col("_s0y").cast("double")
            + b2 * F.col("_s1y").cast("double")
        )
        betas = [b0.alias("b0"), b1.alias("b1"), b2.alias("b2")]
    syy = F.col("_syy").cast("double")
    sse = syy - fit_dot
    sst = syy - F.col("_sy").cast("double") * F.col("_sy").cast(
        "double"
    ) / F.col("n").cast("double")
    r2 = F.when(sst > 0, F.lit(1.0) - sse / sst)
    return agg.select(*gc, "n", *betas, r2.alias("r2"))


def dispersion_test(
    df: DataFrame,
    count_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Poisson dispersion test per group (Fisher's index of
    dispersion) — "are these event counts Poisson, or bursty":
    vmr = s²/x̄ (≈ 1 under Poisson; > 1 overdispersed — the gate
    before trusting any Poisson-rate model on the data), with the
    exact statistic

        chi2 = (n−1)·s²/x̄ = (n·Σx² − (Σx)²) / Σx  ~  χ²(n−1)

    — an EXACT RATIO of integers (DECIMAL(38,0)), one division;
    vmr = chi2/(n−1) one more.  Hash-exact.  Degenerate groups
    (Σx = 0 or n < 2) yield NULLs.

    Plan: one partial-agg'd shuffle onto |groups| rows.  Returns
    (group_cols..., n, mean, vmr, chi2)."""
    gc = list(group_cols or [])
    x = F.col(count_col).cast("long")
    xd = x.cast("decimal(38,0)")
    agg = (
        df.filter(F.col(count_col).isNotNull())
        .groupBy(*gc)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("_s"),
            F.sum(xd * xd).alias("_q"),
        )
    )
    num = (
        F.col("n").cast("decimal(38,0)") * F.col("_q")
        - F.col("_s").cast("decimal(38,0)") * F.col("_s")
    )
    chi2 = F.when(
        (F.col("_s") > 0) & (F.col("n") >= 2),
        num.cast("double") / F.col("_s").cast("double"),
    )
    return agg.filter(F.col("n") > 0).select(
        *gc,
        "n",
        (F.col("_s").cast("double") / F.col("n").cast("double")).alias(
            "mean"
        ),
        (chi2 / (F.col("n") - 1).cast("double")).alias("vmr"),
        chi2.alias("chi2"),
    )
