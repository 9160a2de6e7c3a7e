"""Fan-out sink: route each record to a dynamically computed output
file, and report per-file write stats.

Reference parity: src/Hadron/Run/FanOut.hs — a concurrent multi-file
writer (handle cache keyed by path, buffered appends, tmp-then-rename
finalization, FanOut.hs:93-146) driven by `fanOutTap` with a
record→filepath function (Controller.hs:479-514); the job's official
output is the per-file stats (Controller.hs:490-505). Two sink
strategies: hash-of-path many-open-handles vs sequential one-file-at-
a-time for pre-sorted streams (sinkFanOut / sequentialSinkFanout,
FanOut.hs:151-190).

Spark-first: `df.write.partitionBy(cols)` IS the fan-out sink — the
FileOutputCommitter already does tmp-then-rename atomically, and
dynamic partition insertion handles the handle-cache concern. An
arbitrary record→path *function* becomes a computed partition column.
Stats come from an `observe` pass + a post-write count per partition
value (no second scan of the data — it aggregates the same frame).

The sequential variant maps to sortWithinPartitions before the write,
which makes each task write each output file exactly once.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fan_out_write(
    df: DataFrame,
    out_dir: str,
    path_col: Column | str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    sequential: bool = False,
    options: dict | None = None,
) -> DataFrame:
    """Write `df` routed by `path_col` (a column or an expression
    computing the route — the reference's `a -> FilePath` function,
    Controller.hs:479-483) and return the per-route stats DataFrame
    (route, row count) — the reference's fanStats official output
    (Controller.hs:490-505).

    sequential=True pre-sorts within partitions by the route so each
    task streams one output file at a time (sequentialSinkFanout,
    FanOut.hs:172-190) — fewer open handles on wide fan-outs.
    """
    routed = df.withColumn("_route", F.col(path_col) if isinstance(path_col, str) else path_col)
    if sequential:
        routed = routed.sortWithinPartitions("_route")
    writer = routed.write.format(fmt).mode(mode).partitionBy("_route")
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save(out_dir)
    # stats: aggregate the same lazy frame (Catalyst reuses the scan; at
    # scale this is a cheap count-by-key shuffle, not a second write).
    return routed.groupBy(F.col("_route").alias("route")).agg(
        F.count(F.lit(1)).alias("rows")
    )


def fan_out_by(
    df: DataFrame,
    out_dir: str,
    route_fn: Callable[[DataFrame], Column],
    **kw,
) -> DataFrame:
    """Fan-out with the route computed from the whole row (closest to
    the reference's arbitrary `a -> FilePath`)."""
    return fan_out_write(df, out_dir, route_fn(df), **kw)


def partitioned_write(
    df: DataFrame,
    out_dir: str,
    partition_cols: Sequence[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Plain hive-style partitioned write — the common case where the
    route is existing columns (S7's `partitionBy` mapping)."""
    df.write.format(fmt).mode(mode).partitionBy(*partition_cols).save(out_dir)
