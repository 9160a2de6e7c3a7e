"""Survival analysis: Kaplan–Meier curves and the log-rank test —
time-to-event over right-censored data (user churn, job failure,
document staleness: "how long until X, given most rows haven't X'd
yet", the question naive mean-duration queries silently get wrong by
dropping the censored majority).

Exactness discipline (the house rule): durations quantize to a
DISTINCT-TIME spine with exact integer (at-risk, events, censored)
counts; every survival factor (1 − d/n) is ONE correctly-rounded IEEE
division, and the running product / the log-rank expectation sums
fold the spine in TIME order (fixed left-to-right chains the DuckDB
oracle replays via list folds) — hash-exact cross-engine with zero
logs anywhere (no ln-survival shortcut, which would break the exact
tier).

100 TB shape: the corpus partial-aggregates onto the per-group time
spine in one shuffle; the per-group fold runs over |distinct
durations| (bounded by the quantization contract — days/weeks, not
microseconds), never over subject rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Kaplan–Meier product-limit estimator per group (Kaplan &
    Meier 1958): at each distinct event time t,

        S(t) = Π_{s ≤ t, d_s > 0} (1 − d_s / n_s)

    with n_s the number still at risk entering s and d_s the events
    at s; censored subjects (event = 0) leave the risk set without
    contributing a factor — the estimate the naive "average
    lifetime of the ones we saw finish" is a biased stand-in for.

    Each factor is ONE IEEE division of exact int64 counts and the
    product folds the time spine left-to-right (prefix products via
    per-position slices — O(|spine|²) scalar flops per group,
    never array copies, never subject rows), so every S(t) is
    hash-exact.  Durations must be quantized (days/weeks — the
    bounded-spine contract).

    Plan: one partial-agg'd shuffle onto (group, t) cells, one
    collect of the bounded spine per group, one posexplode back to
    rows.  Returns (group_cols..., t, n_risk, d, c, survival) — one
    row per distinct duration, survival constant through censor-only
    times (the textbook step function)."""
    gc = list(group_cols or [])
    cells = (
        df.filter(
            F.col(duration_col).isNotNull() & F.col(event_col).isNotNull()
        )
        .groupBy(*gc, F.col(duration_col).cast("long").alias("_t"))
        .agg(
            F.sum(F.col(event_col).cast("long")).alias("_d"),
            F.sum(
                F.lit(1) - F.col(event_col).cast("long")
            ).alias("_c"),
        )
    )
    spine = cells.groupBy(*gc).agg(
        F.sort_array(
            F.collect_list(F.struct("_t", "_d", "_c"))
        ).alias("_s"),
        F.sum(F.col("_d") + F.col("_c")).alias("_n"),
    )
    # prefix leavers BEFORE position i (exclusive): n_risk_i = n − that
    sz = F.size(F.col("_s"))
    leavers = F.transform(
        F.sequence(F.lit(1), sz),
        lambda i: F.when(i == 1, F.lit(0).cast("long")).otherwise(
            F.aggregate(
                F.slice(F.col("_s"), F.lit(1), (i - 1).cast("int")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x["_d"] + x["_c"],
            )
        ),
    )
    spine = spine.withColumn("_pre", leavers)
    # survival at position i: fold factors (1 − d/n_risk) for j ≤ i,
    # skipping censor-only times (d = 0 → factor exactly 1, skipped
    # to keep the chain minimal and the oracle identical)
    surv = F.transform(
        F.sequence(F.lit(1), sz),
        lambda i: F.aggregate(
            F.sequence(F.lit(1), i.cast("int")),
            F.lit(1.0),
            lambda acc, j: F.when(
                F.element_at(F.col("_s"), j)["_d"] > 0,
                acc
                * (
                    F.lit(1.0)
                    - F.element_at(F.col("_s"), j)["_d"].cast("double")
                    / (
                        F.col("_n") - F.element_at(F.col("_pre"), j)
                    ).cast("double")
                ),
            ).otherwise(acc),
        ),
    )
    out = spine.withColumn("_sv", surv).select(
        *gc,
        F.posexplode(
            F.arrays_zip(F.col("_s"), F.col("_pre"), F.col("_sv"))
        ).alias("_i", "_z"),
        F.col("_n"),
    )
    return out.select(
        *gc,
        F.col("_z._s._t").alias("t"),
        (F.col("_n") - F.col("_z._pre")).alias("n_risk"),
        F.col("_z._s._d").alias("d"),
        F.col("_z._s._c").alias("c"),
        F.col("_z._sv").alias("survival"),
    )


def logrank_test(
    a: DataFrame,
    b: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Log-rank test per group (Mantel 1966) — do two survival
    curves differ: at each pooled event time the events split
    hypergeometrically under H₀, so

        O₁ − E₁ = Σ_t (d₁t − d_t·n₁t/n_t),
        V = Σ_t d_t·(n₁t/n_t)·(1 − n₁t/n_t)·(n_t − d_t)/(n_t − 1)

    and z = (O₁ − E₁)/√V (χ² = z²).  Counts are exact int64 off the
    pooled time spine; the E and V term sums fold the spine in TIME
    order (fixed IEEE chains — each term three divisions), so z is
    hash-exact.  Degenerate designs (V = 0 — no time with both arms
    at risk and an event) yield z NULL.

    Plan: one partial-agg'd shuffle per arm onto time cells, a
    full-outer spine join, one bounded per-group fold.  Returns
    (group_cols..., n_a, n_b, events_a, events_b, o_minus_e, v,
    z)."""
    gc = list(group_cols or [])

    def side(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.filter(
                F.col(duration_col).isNotNull()
                & F.col(event_col).isNotNull()
            )
            .groupBy(*gc, F.col(duration_col).cast("long").alias("_t"))
            .agg(
                F.sum(F.col(event_col).cast("long")).alias(f"_d{tag}"),
                F.count(F.lit(1)).alias(f"_m{tag}"),
            )
        )

    sa, sb = side(a, "a"), side(b, "b")
    spine = sa.join(sb, [*gc, "_t"], "full_outer").select(
        *gc,
        "_t",
        F.coalesce("_da", F.lit(0)).alias("_da"),
        F.coalesce("_ma", F.lit(0)).alias("_ma"),
        F.coalesce("_db", F.lit(0)).alias("_db"),
        F.coalesce("_mb", F.lit(0)).alias("_mb"),
    )
    g = spine.groupBy(*gc).agg(
        F.sort_array(
            F.collect_list(F.struct("_t", "_da", "_ma", "_db", "_mb"))
        ).alias("_s"),
        F.sum("_ma").alias("n_a"),
        F.sum("_mb").alias("n_b"),
        F.sum("_da").alias("events_a"),
        F.sum("_db").alias("events_b"),
    )
    # fold state [o_minus_e, v, left_a, left_b] where left_* counts
    # subjects who departed strictly before the current time
    na, nb = F.col("n_a"), F.col("n_b")

    def step(acc, x):
        r1 = (na - acc[2]).cast("double")
        r2 = (nb - acc[3]).cast("double")
        rt = r1 + r2
        dt = (x["_da"] + x["_db"]).cast("double")
        term_e = x["_da"].cast("double") - dt * r1 / rt
        term_v = F.when(
            rt > 1,
            dt
            * (r1 / rt)
            * (F.lit(1.0) - r1 / rt)
            * (rt - dt)
            / (rt - F.lit(1.0)),
        ).otherwise(F.lit(0.0))
        return F.array(
            acc[0] + term_e,
            acc[1] + term_v,
            acc[2] + x["_ma"].cast("double"),
            acc[3] + x["_mb"].cast("double"),
        )

    folded = F.aggregate(
        F.col("_s"),
        F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(0.0)),
        step,
    )
    g = g.withColumn("_f", folded)
    z = F.when(
        F.col("_f")[1] > 0, F.col("_f")[0] / F.sqrt(F.col("_f")[1])
    )
    return g.select(
        *gc,
        "n_a",
        "n_b",
        "events_a",
        "events_b",
        F.col("_f")[0].alias("o_minus_e"),
        F.col("_f")[1].alias("v"),
        z.alias("z"),
    )


def restricted_mean_survival(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    tau: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Restricted mean survival time per group (RMST; Royston &
    Parmar 2013 for the modern case) — the area under the
    Kaplan–Meier curve up to horizon `tau`: "expected days alive
    within the first tau days", the honest scalar summary when
    median survival is undefined (curve never crosses 0.5) or
    censoring is heavy.

        RMST(τ) = ∫₀^τ S(t) dt
                = Σ segments S(t_i)·(min(t_{i+1}, τ) − t_i)

    over the KM step function (S = 1 before the first event time).
    Every S value is the `kaplan_meier` product (fixed chains), the
    segment widths are exact integers, and the area accumulates in
    TIME order (one fold over the bounded spine): hash-exact.

    Plan: the kaplan_meier spine fold plus one more pass over the
    same collected spine.  Returns (group_cols..., tau, n, rmst)."""
    if tau <= 0:
        raise ValueError(f"tau must be positive: {tau}")
    gc = list(group_cols or [])
    km = kaplan_meier(df, duration_col, event_col, gc)
    spine = km.groupBy(*gc).agg(
        F.sort_array(
            F.collect_list(F.struct("t", "survival"))
        ).alias("_s"),
        F.sum(F.col("d") + F.col("c")).alias("n"),
    )
    sz = F.size(F.col("_s"))
    tau_l = F.lit(int(tau)).cast("long")
    # segment i spans [t_i, min(t_{i+1}, tau)) at S(t_i); the lead-in
    # [0, min(t_1, tau)) contributes at S = 1
    lead_in = F.least(
        F.element_at(F.col("_s"), 1)["t"], tau_l
    ).cast("double")
    segs = F.aggregate(
        F.sequence(F.lit(1), sz),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(F.col("_s"), i)["survival"]
        * (
            F.greatest(
                F.least(
                    F.when(
                        i < sz,
                        F.element_at(F.col("_s"), (i + 1).cast("int"))["t"],
                    ).otherwise(tau_l),
                    tau_l,
                )
                - F.least(F.element_at(F.col("_s"), i)["t"], tau_l),
                F.lit(0).cast("long"),
            )
        ).cast("double"),
    )
    return spine.select(
        *gc,
        F.lit(int(tau)).alias("tau"),
        "n",
        (F.greatest(lead_in, F.lit(0.0)) + segs).alias("rmst"),
    )
