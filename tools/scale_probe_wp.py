"""WordPiece-trainer SCALE rung: the claim under test is
`wordpiece_word_table`'s contract — after the ONE corpus wordcount
pass, every training round is |distinct-word vocab|-bounded, so
replicating the corpus k× (same words, k× frequencies) should leave
round cost FLAT while only the first pass scales.  APPENDS to
SCALE.md.

Run: python tools/scale_probe_wp.py [sf_dir] [k1,k2,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from hadron_spark import get_spark
    from hadron_spark.llm.wordpiece import wordpiece_train

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ks = [
        int(x)
        for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["1", "4", "16"])
    ]
    spark = get_spark("scale_probe_wp")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = []
    for k in ks:
        parts = [
            docs.select(
                (F.col("doc_id") + F.lit(r * 1_000_000_000)).alias("doc_id"),
                "text",
            )
            for r in range(k)
        ]
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        d = d.persist()
        n = d.count()
        stats: dict = {}
        t0 = time.time()
        merges, vocab = wordpiece_train(d, num_merges=32, stats=stats)
        nv = vocab.count()
        wall = time.time() - t0
        rows.append((k, n, nv, len(merges), stats["rounds"], f"{wall:.2f}s"))
        print(rows[-1], flush=True)
        d.unpersist()

    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE.md",
        ),
        "a",
    ) as f:
        f.write(
            "\n## Round-5 rung: wordpiece_train (32 merges, adaptive)\n"
            "(replication repeats the same words k× — the distinct-word\n"
            "vocab is CONSTANT, so per-round cost must stay flat and only\n"
            "the one corpus wordcount pass scales with k):\n\n"
            "| k | docs | distinct words | merges | rounds | wall |\n"
            "|---|---|---|---|---|---|\n"
        )
        for k, n, nv, nm, nr, w in rows:
            f.write(f"| {k} | {n:,} | {nv:,} | {nm} | {nr} | {w} |\n")
    print("SCALE.md appended")
    spark.stop()


if __name__ == "__main__":
    main()
