"""Structured Streaming surface (beyond-reference capability,
SURVEY §2.7: reference has no streaming)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadron_spark.streaming import (
    run_stream_to_memory,
    sessionize_stream,
    stateful_running_totals,
    stream_tap,
    windowed_agg,
)

# events.parquet is TIMESTAMP(NANOS) → read ts as bigint nanos
# (nanosAsLong) and convert; streaming sources need explicit schemas.
EVENTS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, "
    "event_type string, value double, props string"
)


def _events_stream(spark, sf_dir):
    # the file stream source requires a DIRECTORY; stage a symlink dir
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="stream_events_")
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    raw = stream_tap(spark, d, EVENTS_SCHEMA)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def test_windowed_agg_matches_batch(spark, sf_dir):
    ev = _events_stream(spark, sf_dir)
    agg = windowed_agg(
        ev, "ts", "5 minutes", ["event_type"],
        [F.count(F.lit(1)).alias("n")],
    )
    got = run_stream_to_memory(agg, "win_test", output_mode="complete")

    batch = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )
    expect = (
        batch.groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .count()
    )
    assert got.count() == expect
    assert {"win_start", "win_end", "event_type", "n"} <= set(got.columns)


def test_sessionize_stream(spark, sf_dir):
    ev = _events_stream(spark, sf_dir)
    sess = sessionize_stream(ev, "ts", ["user_id"], gap="30 minutes")
    got = run_stream_to_memory(sess, "sess_test", output_mode="complete")
    rows = got.collect()
    assert len(rows) > 0
    assert all(r["sess_end"] >= r["sess_start"] for r in rows)
    # session count per user matches the batch window-gap computation
    batch_sessions = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy("user_id")
        .count()
        .count()
    )
    assert got.select("user_id").distinct().count() == batch_sessions


def test_stateful_running_totals(spark, sf_dir):
    ev = _events_stream(spark, sf_dir).select("user_id", "value")
    out = run_stream_to_memory(
        stateful_running_totals(ev, "user_id", "value"),
        "state_test",
        output_mode="update",
    )
    rows = {r["user_id"]: r for r in out.collect()}
    batch = {
        r["user_id"]: r
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(rows) == set(batch)
    for k, r in rows.items():
        assert r["n"] == batch[k]["n"]
        assert abs(r["total"] - batch[k]["total"]) < 1e-6


def test_stream_dedup_drops_duplicate_keys(spark, sf_dir):
    from hadron_spark.streaming import stream_dedup

    ev = _events_stream(spark, sf_dir)
    # duplicate every event id by unioning the stream with itself,
    # then dedup within the watermark
    doubled = ev.union(ev)
    deduped = stream_dedup(doubled, ["event_id"], ts_col="ts", watermark="10 minutes")
    out = run_stream_to_memory(deduped, "dedup_test")
    n = out.count()
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert n == total  # every event exactly once


def test_stream_static_enrich(spark, sf_dir):
    from hadron_spark.streaming import enrich

    ev = _events_stream(spark, sf_dir)
    users = spark.createDataFrame(
        [(i, f"tier_{i % 3}") for i in range(1, 51)], "user_id long, tier string"
    )
    joined = enrich(ev, users, on=["user_id"])
    out = run_stream_to_memory(joined.groupBy("tier").count(), "enrich_t", output_mode="complete")
    rows = {r["tier"]: r["count"] for r in out.collect() if r["tier"] is not None}
    assert len(rows) >= 1


def test_stream_stream_join_time_band(spark, sf_dir):
    import os
    import tempfile

    from hadron_spark.streaming import run_stream_to_memory, stream_stream_join, stream_tap
    from pyspark.sql import functions as F

    d = tempfile.mkdtemp(prefix="ss_join_")
    os.symlink(f"{sf_dir}/events.parquet", os.path.join(d, "events.parquet"))
    schema = (
        "event_id bigint, ts bigint, user_id bigint, "
        "event_type string, value double, props string"
    )

    def src():
        raw = stream_tap(spark, d, schema)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

    left = src().select("user_id", F.col("ts").alias("l_ts"), "event_id")
    right = src().select(
        "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("r_id")
    )
    joined = stream_stream_join(
        left, right, ["user_id"], "l_ts", "r_ts", bound="5 minutes"
    )
    out = run_stream_to_memory(joined, "ss_join")
    n = out.count()
    # self-join within ±5min: at least the |events| self-pairs exist
    ev_n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert n >= ev_n
    # band respected
    bad = out.filter(F.abs(F.col("l_ts").cast("long") - F.col("r_ts").cast("long")) > 300).count()
    assert bad == 0


def test_foreach_batch_upsert(spark, sf_dir, tmp_path):
    import os

    from hadron_spark.streaming import foreach_batch_upsert, stream_tap
    from pyspark.sql import functions as F

    d = str(tmp_path / "src")
    os.makedirs(d)
    os.symlink(f"{sf_dir}/events.parquet", os.path.join(d, "events.parquet"))
    schema = (
        "event_id bigint, ts bigint, user_id bigint, "
        "event_type string, value double, props string"
    )
    counts = stream_tap(spark, d, schema).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    target = str(tmp_path / "target")
    q = foreach_batch_upsert(
        counts, target, ["user_id"], checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = {r["user_id"]: r["n"] for r in spark.read.parquet(target).collect()}
    want = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
