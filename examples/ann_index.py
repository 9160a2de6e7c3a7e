"""ANN index lifecycle: build-once / query-many.

Builds both persisted index layouts over the embeddings table —
the IVF cell-partitioned parquet (partition pruning IS the inverted
file) and the PQ code table (~32× smaller rows + codebook JSON) —
then answers queries from the saved artifacts alone and times the
amortized search path against one-shot brute force.

Run: python examples/ann_index.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.llm import similarity as S


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann_index")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 20)

    t0 = time.time()
    exact = S.brute_force_topk(emb, queries, k=10).count()
    t_bf = time.time() - t0
    print(f"[brute force] {exact} result rows in {t_bf:.2f}s (per-query full scan)")

    with tempfile.TemporaryDirectory(prefix="ann_index_") as d:
        t0 = time.time()
        S.build_ivf_index(emb, f"{d}/ivf", n_centroids=16)
        t_build = time.time() - t0
        t0 = time.time()
        n = S.ivf_search(spark, f"{d}/ivf", queries, k=10, n_probe=4).count()
        t_q = time.time() - t0
        print(
            f"[ivf index] build {t_build:.2f}s (once), search {n} rows in "
            f"{t_q:.2f}s — probed cells only (PartitionFilters prune the rest)"
        )

        t0 = time.time()
        books = S.pq_train(emb, m=8, codes=16)
        enc = S.pq_encode(emb, books)
        S.save_pq_index(enc, books, f"{d}/pq")
        t_build = time.time() - t0
        books2, enc2 = S.load_pq_index(spark, f"{d}/pq")
        t0 = time.time()
        n = S.pq_topk(
            emb, queries, k=10, codebooks=books2, encoded=enc2, refine=8
        ).count()
        t_q = time.time() - t0
        print(
            f"[pq index] build {t_build:.2f}s (once), ADC+refine search {n} "
            f"rows in {t_q:.2f}s over ~32x-compressed codes"
        )
    spark.stop()


if __name__ == "__main__":
    main()
