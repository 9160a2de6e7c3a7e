"""Plan inspection & assertion utilities.

The reference exposes raw physical knobs (partitioner flags,
comparator flags, reducer counts — SURVEY §2.6) because Hadoop
Streaming has no optimizer. This engine delegates to Catalyst, and
this module is the flip side of that delegation: programmatic checks
that the optimizer actually produced the plan we want — filters
pushed to the scan, small dims broadcast, partial aggregation before
the exchange, no stray shuffles. Tests and tuning loops use these
instead of eyeballing `.explain()` output.
"""

from hadron_spark.plans.diag import join_cardinality, key_skew_profile
from hadron_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_shuffle,
    assert_no_unpartitioned_window,
    assert_partial_aggregation,
    assert_pushed_filters,
    codegen_stage_count,
    explain_str,
    shuffle_count,
    unpartitioned_window_count,
)

__all__ = [
    "join_cardinality",
    "key_skew_profile",
    "explain_str",
    "shuffle_count",
    "codegen_stage_count",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "assert_partial_aggregation",
    "assert_no_shuffle",
    "assert_no_unpartitioned_window",
    "unpartitioned_window_count",
]
