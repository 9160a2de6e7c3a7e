"""End-to-end training-corpus preparation: the full funnel a pretrain
data pipeline runs, composed entirely from engine operators —

  quality rules → exact dedup → MinHash near-dedup → language ID
  → deterministic train/val/test split → BPE token budget per split
  → fan-out write partitioned by split

Run: python examples/corpus_prep.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.functions.text import bpe_token_count
from hadron_spark.llm.dedup import exact_dedup, minhash_dedup
from hadron_spark.llm.filters import apply_quality_filter
from hadron_spark.llm.textstats import language_id
from hadron_spark.operators import ops
from hadron_spark.sources.fanout import fan_out_write
from hadron_spark.sources.taps import Tap


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="corpus_")
    spark = get_spark("corpus_prep")

    docs = Tap([f"{sf_dir}/documents.parquet"], "parquet").read(spark)
    n0 = docs.count()

    clean = apply_quality_filter(docs).filter("keep").drop("keep")
    n1 = clean.count()

    deduped = minhash_dedup(exact_dedup(clean), threshold=0.8)
    n2 = deduped.count()

    tagged = language_id(deduped)

    split = ops.hash_split(
        tagged, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
    )

    budget = (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(bpe_token_count(F.col("text"))).alias("bpe_tokens"),
        )
        .orderBy("split")
    )

    stats = fan_out_write(split, out_dir, "split", fmt="parquet")

    print(f"input docs:      {n0}")
    print(f"quality keep:    {n1}  (-{n0 - n1})")
    print(f"after dedup:     {n2}  (-{n1 - n2})")
    for r in budget.collect():
        print(f"{r['split']:>5}: {r['n_docs']} docs, {r['bpe_tokens']} bpe tokens")
    print(f"wrote {out_dir} partitioned by split; routes:")
    for r in stats.collect():
        print(f"  {r}")
    spark.stop()


if __name__ == "__main__":
    main()
