"""Filter-evaluation loop — train a quality classifier, then read the
numbers a curation team actually decides with: the exact PR curve
(pick the cutoff), tie-aware AUC (ranking power), calibration/ECE
(can you trust the scores), agreement with a heuristic annotator
(kappa), and the per-source pass rate with Wilson uncertainty.

Run: python examples/evaluate_filter.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.functions.text import tokenize
from hadron_spark.llm.evaluation import (
    auc,
    cohens_kappa,
    expected_calibration_error,
    pr_curve,
)
from hadron_spark.operators.robust import pass_rate_ci
from hadron_spark.sources.taps import Tap


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("evaluate_filter_example")

    docs = Tap([f"{sf_dir}/documents.parquet"], "parquet").read(spark)
    toks = tokenize(F.lower(F.col("text")))
    scored = docs.select(
        "source",
        F.size(toks).alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )

    a = auc(scored, "score", "y").collect()[0]
    print(f"[1] AUC = {a['auc']:.4f}  (pos={a['n_pos']}, neg={a['n_neg']})")

    curve = pr_curve(scored, "score", "y")
    best = (
        curve.filter(F.col("precision") >= 0.5)
        .orderBy(F.col("recall").desc(), F.col("threshold").asc())
        .limit(1)
        .collect()
    )
    if best:
        b = best[0]
        print(
            f"[2] cutoff for precision>=0.5: score>={b['threshold']} "
            f"(P={b['precision']:.3f} R={b['recall']:.3f} F1={b['f1']:.3f})"
        )
    else:
        print("[2] no threshold reaches precision 0.5")

    capped = scored.select(
        F.least(F.lit(100), F.col("score")).alias("p"), "y"
    )
    e = expected_calibration_error(capped, "p", "y").collect()[0]
    print(f"[3] ECE (10 bins) = {e['ece']:.4f}")

    lab = docs.select(
        F.when(F.size(toks) >= 60, "keep").otherwise("drop").alias("a"),
        F.when(F.size(F.array_distinct(toks)) * 2 >= F.size(toks), "keep")
        .otherwise("drop")
        .alias("b"),
    )
    k = cohens_kappa(lab, "a", "b").collect()[0]
    print(f"[4] annotator agreement kappa = {k['kappa']:.4f} (p_o={k['p_o']:.3f})")

    gate = docs.select(
        "source", (F.size(toks) >= 60).cast("int").alias("f")
    )
    print("[5] per-source pass rate (Wilson 95%):")
    for r in pass_rate_ci(gate, ["source"], "f").orderBy("source").collect():
        print(
            f"    {r['source']}: {r['rate']:.3f} "
            f"[{r['ci_lo']:.3f}, {r['ci_hi']:.3f}] (n={r['n']})"
        )

    spark.stop()
    print("evaluate_filter: OK")


if __name__ == "__main__":
    main()
