"""Incremental corpus ingest — the nightly-batch maintenance story in
one script, composing pieces that are each oracle/test-proven:

  day 0: seed corpus → signature store + token rollup + clustered
         parquet store
  day 1+: new batch → hygiene scrub → dedup AGAINST THE STORE (the
         corpus is never re-shingled, only its saved signature table
         joins) → append kept docs + their signatures → merge the
         token rollup from the batch's partial (raw history never
         rescanned) → append to the Z-ordered store

Run: python examples/incremental_ingest.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.functions.text import dedup_lines, html_to_text, redact_pii, tokenize
from hadron_spark.llm.dedup import minhash_dedup_incremental, minhash_signature
from hadron_spark.operators.maintenance import incremental_rollup


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("incremental_ingest")
    root = tempfile.mkdtemp(prefix="hadron_ingest_")
    sig_store = f"{root}/signatures"
    rollup_store = f"{root}/token_rollup"
    corpus_store = f"{root}/corpus"

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    day0 = docs.filter(F.col("doc_id") % 2 == 0)
    # the "new" batch overlaps day0 heavily: half are near-dups
    day1 = docs.filter(
        (F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 4 == 0)
    ).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 4 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )

    def scrub(df):
        return df.withColumn(
            "text", redact_pii(dedup_lines(html_to_text(F.col("text"))))
        )

    # ---- day 0: seed all three stores
    seed = scrub(day0)
    minhash_signature(seed).select(
        F.col("doc_id").alias("_id"), "sig"
    ).write.mode("overwrite").parquet(sig_store)
    seed.groupBy("source").agg(
        F.sum(F.size(tokenize(F.col("text")))).alias("tokens"),
        F.count(F.lit(1)).alias("docs"),
    ).write.mode("overwrite").parquet(rollup_store)
    seed.write.mode("overwrite").parquet(corpus_store)
    n0 = spark.read.parquet(corpus_store).count()

    # ---- day 1: scrub, dedup against the STORE, append everything
    batch = scrub(day1)
    sigs = spark.read.parquet(sig_store)
    kept = minhash_dedup_incremental(batch, sigs, threshold=0.6)
    kept = kept.localCheckpoint()  # consumed by 3 writers below
    n_batch, n_kept = batch.count(), kept.count()

    kept.write.mode("append").parquet(corpus_store)
    minhash_signature(kept).select(
        F.col("doc_id").alias("_id"), "sig"
    ).write.mode("append").parquet(sig_store)
    batch_rollup = kept.groupBy("source").agg(
        F.sum(F.size(tokenize(F.col("text")))).alias("tokens"),
        F.count(F.lit(1)).alias("docs"),
    )
    merged = incremental_rollup(
        spark.read.parquet(rollup_store),
        batch_rollup,
        ["source"],
        [F.sum("tokens").alias("tokens"), F.sum("docs").alias("docs")],
    )
    # rollup merge cost is O(|rollup|+|batch|): history never rescanned
    merged_rows = merged.count()

    n_total = spark.read.parquet(corpus_store).count()
    print(f"day0 corpus:     {n0}")
    print(f"day1 batch:      {n_batch}  kept after store-dedup: {n_kept}")
    print(f"corpus now:      {n_total}")
    print(f"rollup keys:     {merged_rows}")
    assert n_total == n0 + n_kept
    assert n_kept < n_batch  # the seeded near-dups were dropped
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
