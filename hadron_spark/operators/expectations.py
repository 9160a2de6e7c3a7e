"""Declarative data-quality expectations — the contract check a
pipeline runs on every snapshot BEFORE publishing it (the
great-expectations shape, engine-native): each expectation compiles
to conditional aggregates over ONE scan, so a 20-check suite costs
one pass over the table, not 20.

Exactness: every reported number is an exact count or ONE division
of exact counts — trivially hash-exact; the suite result is itself a
small DataFrame, so it can be stored, diffed across snapshots, and
gated on (`fail_on_violations`).

100 TB shape: all row-wise checks fold into a single partial-agg'd
aggregate (one shuffle of one combined row per partition);
`unique` checks add exact count-distincts into the SAME aggregate.
Nothing is collected until the caller decides.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation: `name` (stable id in the report), `column`
    (reported, informational), `violation` — a Column that is true
    on BAD rows — and optionally `unique` to request an exact
    distinctness check instead of a row predicate."""

    name: str
    column: str
    violation: Column | None = None
    unique: bool = False
    meta: dict = field(default_factory=dict)


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", col, F.col(col).isNull())


def unique(col: str) -> Check:
    return Check(f"unique({col})", col, unique=True)


def in_range(col: str, lo, hi) -> Check:
    c = F.col(col)
    return Check(
        f"in_range({col},{lo},{hi})",
        col,
        c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def accepted_values(col: str, values: list) -> Check:
    return Check(
        f"accepted_values({col})",
        col,
        F.col(col).isNotNull() & ~F.col(col).isin(*values),
    )


def matches(col: str, pattern: str) -> Check:
    return Check(
        f"matches({col})",
        col,
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def custom(name: str, col: str, violation: Column) -> Check:
    return Check(name, col, violation)


def expect(
    df: DataFrame,
    checks: list[Check],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Run the suite in ONE aggregate pass (plus exact distinct
    counts for `unique` checks, folded into the same aggregate).
    Returns (group_cols..., check, column, n_rows, n_violations,
    pass) — one row per check, `pass` = zero violations.  For a
    `unique` check n_violations = n_rows − n_distinct (the number
    of surplus duplicate rows)."""
    if not checks:
        raise ValueError("expect: empty check suite")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"expect: duplicate check names: {names}")
    gc = list(group_cols or [])
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(checks):
        if c.unique:
            aggs.append(F.countDistinct(F.col(c.column)).alias(f"_c{i}"))
        else:
            aggs.append(
                F.sum(F.when(c.violation, 1).otherwise(0)).alias(f"_c{i}")
            )
    agg = df.groupBy(*gc).agg(*aggs)
    per_check = []
    for i, c in enumerate(checks):
        viol = (
            F.col("_n") - F.col(f"_c{i}")
            if c.unique
            else F.col(f"_c{i}")
        )
        per_check.append(
            F.struct(
                F.lit(c.name).alias("check"),
                F.lit(c.column).alias("column"),
                viol.cast("long").alias("n_violations"),
            )
        )
    exploded = agg.select(
        *gc,
        F.col("_n").alias("n_rows"),
        F.explode(F.array(*per_check)).alias("_r"),
    )
    return exploded.select(
        *gc,
        F.col("_r.check").alias("check"),
        F.col("_r.column").alias("column"),
        "n_rows",
        F.col("_r.n_violations").alias("n_violations"),
        (F.col("_r.n_violations") == 0).alias("pass"),
    )


def fail_on_violations(report: DataFrame) -> None:
    """Gate: raise if any check failed — the publish-blocking mode.
    Collects only the FAILED rows (bounded by the suite size)."""
    bad = report.filter(~F.col("pass")).collect()
    if bad:
        lines = ", ".join(
            f"{r['check']}: {r['n_violations']}/{r['n_rows']}" for r in bad
        )
        raise AssertionError(f"expectation failures: {lines}")


def foreign_key(
    child: DataFrame,
    col: str,
    parent: DataFrame,
    parent_col: str,
    name: str | None = None,
) -> DataFrame:
    """Referential-integrity expectation across tables: count child
    rows whose non-null `col` has no match in `parent.parent_col`.
    Same report row shape as `expect` (check, column, n_rows,
    n_violations, pass) so suites union cleanly.

    Plan: one broadcast-or-shuffle LEFT ANTI join (Catalyst picks by
    parent size) + one count pass — orphans are counted, never
    collected."""
    nm = name or f"foreign_key({col})"
    n_rows = child.count()
    orphans = (
        child.filter(F.col(col).isNotNull())
        .join(
            parent.select(F.col(parent_col).alias(col)).distinct(),
            col,
            "left_anti",
        )
        .count()
    )
    spark = child.sparkSession
    return spark.createDataFrame(
        [(nm, col, n_rows, orphans, orphans == 0)],
        "check string, column string, n_rows long, n_violations long, "
        "pass boolean",
    )
