"""Corpus dedup — the LLM-pipeline flagship: exact dedup → MinHash-LSH
near-dup removal → quality filter, each stage reporting its reduction.

Run: python examples/dedup_corpus.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from hadron_spark import get_spark
from hadron_spark.llm.dedup import exact_dedup, minhash_dedup
from hadron_spark.llm.filters import apply_quality_filter
from hadron_spark.sources.taps import Tap


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("dedup_example")

    docs = Tap([f"{sf_dir}/documents.parquet"], "parquet").read(spark)
    n0 = docs.count()

    exact = exact_dedup(docs)
    n1 = exact.count()

    near = minhash_dedup(exact, threshold=0.8)
    n2 = near.count()

    clean = apply_quality_filter(near).filter("keep")
    n3 = clean.count()

    print(f"input:        {n0}")
    print(f"exact dedup:  {n1}  (-{n0 - n1})")
    print(f"near dedup:   {n2}  (-{n1 - n2})")
    print(f"quality keep: {n3}  (-{n2 - n3})")
    spark.stop()


if __name__ == "__main__":
    main()
