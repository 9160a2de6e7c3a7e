"""Bucketed (pre-partitioned, co-located) tables — the shuffle-free
join path for repeated big⋈big joins.

The reference controls reducer routing per job (PartitionStrategy,
Run/Hadoop.hs:129-166) but has no persistent co-location: every join
re-shuffles. Spark's bucketing persists the partitioning INTO the
table layout: writing both sides bucketed by the join key into the
same number of buckets lets every later join/aggregation on that key
plan with zero exchanges — at 100 TB this turns the nightly
fact⋈fact join from the dominant shuffle into a local merge.

Catalog note: bucket metadata lives in the session catalog
(`saveAsTable`), not in plain parquet paths — `bucketed_write` is a
catalog write. Plans: `spark.table(name)` scans report the bucket
spec, and `assert_no_shuffle_join` (tests/plans) verifies the
exchange-free join this module exists for.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def bucketed_write(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed catalog table. `sort_cols` also
    sorts within each bucket file (sortBy), which removes the sort
    from later sort-merge joins — the persistent form of the
    reference's secondary sort (O1)."""
    writer = (
        df.write.format(fmt)
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with `bucketed_write` on
    their bucket key. When both sides have the same bucket count and
    key, the planner emits a SortMergeJoin with NO exchange on either
    side (and no sort, if sortBy matched the join key)."""
    return spark.table(left_table).join(spark.table(right_table), on=list(on), how=how)
