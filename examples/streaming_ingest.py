"""Streaming corpus ingest — the live counterpart of
examples/corpus_prep.py: documents arrive as micro-batches and each
one passes the full admission pipeline before touching the corpus:

1. stateless hygiene (functions.text.html_to_text -> dedup_lines ->
   redact_pii) — expression-only, so the SAME code runs on the
   stream unchanged, byte-identical to batch;
2. `streaming.ops.incremental_near_dup` — the MinHash-LSH ingest
   gate: each batch is deduped against everything already admitted
   (persisted signature store, first arrival wins) and self-deduped;
3. `streaming.ops.incremental_histogram` keeps the live length
   distribution of the ADMITTED corpus for the ops dashboard.

All state survives restarts (exactly-once trio: HWM markers,
idempotent per-batch partitions, swap healing).

Run: python examples/streaming_ingest.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.functions.text import dedup_lines, html_to_text, redact_pii
from hadron_spark.streaming.ops import (
    incremental_histogram,
    neardup_apply_fn,
    read_histogram_state,
    read_neardup_kept,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming_ingest_example")
    work = tempfile.mkdtemp(prefix="stream_ingest_")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    # plant near-duplicates: a "re-crawl" batch whose docs differ
    # only by a trailing byte — the gate must reject them
    recrawl = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "source",
        F.concat(F.col("text"), F.lit(" ")).alias("text"),
    )

    print("[1] hygiene chain (stateless -> identical on stream or batch):")
    def scrub(df):
        return df.select(
            "doc_id",
            "source",
            redact_pii(dedup_lines(html_to_text(F.col("text")))).alias("text"),
        )

    state = f"{work}/gate"
    gate = neardup_apply_fn(state, threshold=0.7)
    batches = [
        scrub(docs.filter(F.col("doc_id") % 2 == 0)),
        scrub(docs.filter(F.col("doc_id") % 2 == 1)),
        scrub(recrawl),  # the re-crawl: all near-dups of admitted docs
    ]
    for i, b in enumerate(batches):
        gate(b, i)
        admitted = read_neardup_kept(spark, state)
        print(f"    batch {i}: in={b.count():4d} admitted_total={admitted.count():4d}")

    kept = read_neardup_kept(spark, state)
    rejected = docs.count() + recrawl.count() - kept.count()
    print(f"[2] gate summary: {kept.count()} admitted, {rejected} rejected")
    assert kept.filter(F.col("doc_id") >= 1_000_000).count() == 0, (
        "re-crawl near-dups must not be admitted"
    )

    print("[3] live length histogram of the ADMITTED corpus:")
    src = f"{work}/hist_src"
    kept.select("source", F.length("text").cast("long").alias("n")).coalesce(
        2
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("source string, n bigint").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = incremental_histogram(
        stream, f"{work}/hist", "source", "n",
        lo=0, hi=600, n_bins=6, checkpoint=f"{work}/ckpt",
    )
    q.awaitTermination(300)
    hist = read_histogram_state(spark, f"{work}/hist", "source")
    for r in hist.orderBy(F.col("cnt").desc()).limit(5).collect():
        print(f"    {r['source']} bin {r['bin']}: {r['cnt']}")

    shutil.rmtree(work, ignore_errors=True)
    print("all steps ran")
    spark.stop()


if __name__ == "__main__":
    main()
