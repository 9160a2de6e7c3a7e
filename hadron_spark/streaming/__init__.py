"""Structured Streaming surface.

The reference has NO streaming (SURVEY §2.7 — its `Hadron.Streams`
module is io-streams plumbing, not stream processing). This module is
a beyond-reference capability: the same engine operators applied to
unbounded input via Structured Streaming — file-source ingestion,
watermarked event-time windows, session windows, and a custom
stateful operator via applyInPandasWithState.

Batch/stream parity: the transformations here are the SAME DataFrame
expressions the batch queries use; only source/sink differ. That is
the point of building on Spark rather than porting the reference's
execution machinery.
"""

from hadron_spark.streaming.ops import (
    enrich,
    foreach_batch_upsert,
    incremental_gram,
    run_stream_to_memory,
    sessionize_stream,
    stateful_running_totals,
    stream_dedup,
    stream_stream_join,
    stream_tap,
    windowed_agg,
)

__all__ = [
    "stream_tap",
    "stream_dedup",
    "stream_stream_join",
    "enrich",
    "foreach_batch_upsert",
    "incremental_gram",
    "windowed_agg",
    "sessionize_stream",
    "stateful_running_totals",
    "run_stream_to_memory",
]
