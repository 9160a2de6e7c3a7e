"""End-to-end training-data curation with the round-3/4 tier:

  quality classifier (trained on heuristic labels) -> CCNet-style
  n-gram LM perplexity band cut -> exact-substring dedup (Lee et al.
  ExactSubstr) -> DSIR selection toward a target subcorpus ->
  tokenizer training (adaptive-batched BPE) -> per-source BPE token
  accounting.

Each stage prints its reduction / output so the funnel is visible.

Run: python examples/training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.llm.bpe import bpe_apply, bpe_train
from hadron_spark.llm.classifier import (
    apply_quality_classifier,
    train_quality_classifier,
)
from hadron_spark.llm.dedup import exact_substring_dedup
from hadron_spark.llm.dsir import dsir_resample
from hadron_spark.llm.perplexity import ngram_lm_train, perplexity_band
from hadron_spark.sources.taps import Tap


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training_data_pipeline")

    docs = Tap([f"{sf_dir}/documents.parquet"], "parquet").read(spark)
    n0 = docs.count()

    # 1. model-based quality filter: train on a heuristic proxy label
    # (substantive length — the synthetic corpus shares vocabulary
    # across languages, so length is the separable demo signal),
    # keep what the model scores >= 0.5
    labeled = docs.withColumn(
        "y", (F.length("text") >= 300).cast("int")
    )
    w = train_quality_classifier(labeled, "y", iters=40)
    kept = apply_quality_classifier(docs, w).filter("keep").select("doc_id")
    quality = docs.join(kept, "doc_id")
    n1 = quality.count()

    # 2. perplexity band: score against a trigram stupid-backoff LM
    # trained on the quality survivors themselves (self-LM: the
    # standard move when no external reference corpus is mounted),
    # keep the lowest-perplexity two-thirds
    lm = ngram_lm_train(quality, order=3, n_buckets=1 << 16)
    banded = quality.join(
        perplexity_band(quality, lm, keep_hi=2 / 3).select("doc_id"),
        "doc_id",
    )
    n1b = banded.count()

    # 3. exact-substring dedup: cut corpus-wide repeated 8-token spans
    deduped = exact_substring_dedup(banded, window=8).select(
        "doc_id", F.col("clean_text").alias("text")
    ).filter(F.col("text") != "")
    deduped = deduped.join(
        docs.select("doc_id", "lang", "source"), "doc_id"
    )
    n2 = deduped.count()

    # 4. DSIR: sample half the survivors toward the English target
    target = deduped.filter(F.col("lang") == "en")
    k = max(1, n2 // 2)
    selected = dsir_resample(deduped, target, k=k, n_buckets=4096)
    n3 = selected.count()

    # 5. train a small BPE vocab on the selection (adaptive batched
    # rounds), then account tokens per source under the trained vocab
    stats: dict = {}
    merges, vocab = bpe_train(selected, num_merges=32, stats=stats)
    counts = bpe_apply(selected, vocab, ["source"]).orderBy("source")

    print(f"input:            {n0}")
    print(f"quality keep:     {n1}  (-{n0 - n1})")
    print(f"perplexity band:  {n1b}  (-{n1 - n1b})")
    print(f"substring dedup:  {n2}  (-{n1b - n2})")
    print(f"DSIR selection:   {n3}  (target half, importance-weighted)")
    print(
        f"BPE: {len(merges)} merges in {stats['rounds']} Spark rounds; "
        "tokens/source:"
    )
    for r in counts.collect():
        print(f"  {r['source']}: {r['n_bpe_tokens']}")
    spark.stop()


if __name__ == "__main__":
    main()
