"""Token-budget shopping — the two-step a pretraining-data owner runs
before committing a fixed training-token bill (Hoffmann et al. 2022
makes the budget a TOKEN count, not a document count):

1. `llm.evaluation.token_budget_curve` prices the scorer: rank by
   quality score, and per decile read off how much of the corpus
   token mass a budget that deep spends (token_share) vs how much
   quality mass it captures (quality_capture) and at what lift over
   random spending.
2. `llm.mixing.select_token_budget` then MATERIALIZES the chosen
   budget: the exact highest-score document prefix whose inclusive
   running token total stays within it (banded prefix sum — no
   single-partition window).

Both stages are exact-integer + one-IEEE-division arithmetic
(hash-exact: q304's oracle states the curve as plain SQL).

Run: python examples/token_budget.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.functions.text import token_count
from hadron_spark.llm.evaluation import token_budget_curve
from hadron_spark.llm.mixing import select_token_budget
from hadron_spark.sources.taps import Tap


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("token_budget_example")

    docs = Tap([f"{sf_dir}/documents.parquet"], "parquet").read(spark).select(
        "doc_id",
        F.col("n_chars").cast("long").alias("score"),  # the "quality" scorer
        token_count(F.col("text")).alias("tok"),
        # quality mass to capture: English tokens
        F.when(F.col("lang") == "en", token_count(F.col("text")))
        .otherwise(0)
        .alias("q"),
    )

    print("[1] decile budget curve (score = n_chars, quality = en tokens):")
    curve = token_budget_curve(
        docs, "score", "tok", "q", "doc_id", n_buckets=10
    ).orderBy("tile")
    rows = curve.collect()
    for r in rows:
        print(
            f"    tile {r['tile']:2d}: spend {r['token_share']:6.1%} of tokens"
            f" -> capture {r['quality_capture']:6.1%} of quality"
            f"  (lift {r['lift']:.3f})"
        )

    # pick the shallowest decile capturing >= 60% of the quality mass
    pick = next((r for r in rows if r["quality_capture"] >= 0.60), rows[-1])
    budget = pick["cum_tokens"]
    print(
        f"[2] chosen budget: tile {pick['tile']} -> {budget} tokens"
        f" ({pick['token_share']:.1%} of corpus, "
        f"{pick['quality_capture']:.1%} quality captured)"
    )

    sel = select_token_budget(docs, budget, "score", "tok", id_col="doc_id")
    n, spent = sel.agg(
        F.count(F.lit(1)).alias("n"), F.sum("tok").alias("t")
    ).collect()[0]
    print(f"[3] materialized: {n} documents, {spent} tokens (<= {budget})")
    assert spent <= budget
    print("all steps ran")
    spark.stop()


if __name__ == "__main__":
    main()
