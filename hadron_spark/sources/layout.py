"""Multi-dimensional data layout: Z-order (Morton) clustering.

Sorting 100 TB of parquet on ONE column gives min/max row-group
stats that prune scans on that column only. Interleaving the bits of
several columns into one Z-value and range-sorting on it clusters
rows that are close in EVERY dimension, so row-group min/max stats
prune filters on any participating column (the technique Delta/
Iceberg expose as OPTIMIZE ZORDER BY; Morton 1966). The reference has
no layout control at all — files are whatever the reducer wrote
(SURVEY §2.6).

The Z-value is pure bitwise integer arithmetic (shift/and/or — never
overflow-checked under ANSI, and bit-identical in any engine), built
as ONE SQL expression string: the same string runs on Spark and on
the DuckDB oracle, and a single F.expr parse avoids per-term py4j
round-trips.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_sql(cols: Sequence[str], bits: int = 10) -> str:
    """ANSI SQL expression interleaving the low `bits` bits of each
    column into a Morton code (col i contributes bit b to position
    b·n_cols + i). Valid Spark SQL and DuckDB SQL verbatim."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns")
    if bits * n > 63:
        raise ValueError(f"{bits} bits x {n} cols exceeds a signed 64-bit value")
    terms = [
        f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * n + i})"
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return " | ".join(terms)


def zorder_value(cols: Sequence[str], bits: int = 10):
    """The Morton code as a Column (one F.expr parse)."""
    return F.expr(zorder_sql(cols, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 10,
    num_files: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write `df` Z-ordered on `cols`: range-partition by the Morton
    code (equal-size output files via range exchange sampling), sort
    within partitions, drop the helper column. Readers filtering on
    any of `cols` then skip row groups via min/max stats — no index
    structure, just layout."""
    z = df.withColumn("_z", zorder_value(cols, bits))
    rep = (
        z.repartitionByRange(num_files, "_z")
        if num_files
        else z.repartitionByRange("_z")
    )
    rep.sortWithinPartitions("_z").drop("_z").write.format(fmt).mode(mode).save(path)
