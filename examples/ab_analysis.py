"""A/B analysis shift — the inferential-statistics kit composed the
way an experiment readout actually runs, every number hash-exact
(integer sufficient statistics + fixed IEEE chains, the q307-q310
sorted-fold discipline):

1. `brown_forsythe` — may variances be pooled across arms at all?
2. `anova_oneway` — k-arm mean difference (the parametric read);
3. `kruskal_wallis` — the rank-based read that survives outliers
   and non-normality (report both; disagreement IS information);
4. `mcnemar` — two models scored on the SAME rows (paired, so a
   two-proportion z would overstate certainty);
5. `jonckheere_terpstra` — when the arms are ORDERED (dose levels,
   model sizes), the directional follow-up with real power;
6. `friedman` + 7. `page_trend` — the repeated-measures pair: k
   scorers on the SAME documents, unordered then ordered.

Run: python examples/ab_analysis.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.functions.text import token_count
from hadron_spark.llm.evaluation import mcnemar
from hadron_spark.operators.robust import (
    anova_oneway,
    brown_forsythe,
    friedman,
    jonckheere_terpstra,
    kruskal_wallis,
    page_trend,
)
from hadron_spark.sources.taps import Tap


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ab_analysis_example")

    ev = Tap([f"{sf_dir}/events.parquet"], "parquet").read(spark).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).filter(F.col("cents").isNotNull())

    print("[1] Brown-Forsythe: may we pool variances across arms?")
    bf = brown_forsythe(ev, "cents", "event_type").collect()[0]
    print(f"    k={bf['k']} n={bf['n']} F={bf['f']:.4f}"
          f"  (large F -> heteroscedastic, read ANOVA with care)")

    print("[2] one-way ANOVA on arm means:")
    an = anova_oneway(ev, "cents", "event_type").collect()[0]
    print(f"    F={an['f']:.4f}  ss_between={an['ss_between']:.1f}"
          f"  ss_within={an['ss_within']:.1f}")

    print("[3] Kruskal-Wallis on arm distributions (rank-based):")
    kw = kruskal_wallis(ev, "cents", "event_type").collect()[0]
    print(f"    H={kw['h']:.4f}  tie-corrected H={kw['h_corrected']:.4f}")

    print("[4] McNemar: two 'is it English' models on the SAME docs:")
    docs = Tap([f"{sf_dir}/documents.parquet"], "parquet").read(spark).select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.when(F.col("n_chars") >= 280, 1).otherwise(0).alias("pa"),
        F.when(token_count(F.col("text")) >= 45, 1).otherwise(0).alias("pb"),
    )
    mc = mcnemar(docs, "pa", "pb", "y").collect()[0]
    print(f"    discordant b={mc['b']} c={mc['c']}"
          f"  chi2={mc['chi2']:.4f}  chi2_cc={mc['chi2_cc']:.4f}"
          f"  ({mc['n_concordant']}/{mc['n']} rows concordant"
          " — the information a two-proportion z throws away)")

    print("[5] Jonckheere-Terpstra: arms ORDERED by label — do values"
          " rise with the order?")
    jt = jonckheere_terpstra(ev, "cents", "event_type").collect()[0]
    print(f"    JT={jt['jt']:.1f}  z={jt['z']:.4f}"
          "  (directional: sign says which way the trend runs)")

    print("[6]+[7] repeated measures: three doc scorers on the SAME"
          " documents")
    docs2 = Tap([f"{sf_dir}/documents.parquet"], "parquet").read(spark)
    lf = (
        docs2.select(
            F.col("doc_id").alias("b"), F.lit("chars").alias("t"),
            F.col("n_chars").cast("long").alias("y"))
        .unionByName(docs2.select(
            F.col("doc_id").alias("b"), F.lit("tokens").alias("t"),
            (token_count(F.col("text")) * 6).cast("long").alias("y")))
        .unionByName(docs2.select(
            F.col("doc_id").alias("b"), F.lit("lines").alias("t"),
            ((F.length("text")
              - F.length(F.replace(F.col("text"), F.lit("."))))
             * 40).cast("long").alias("y")))
    )
    fr = friedman(lf, "b", "t", "y").collect()[0]
    print(f"    friedman: chi2={fr['chi2']:.4f}  W={fr['kendall_w']:.4f}"
          "  (do the scorers rank docs differently AT ALL?)")
    pg = page_trend(lf, "b", "t", "y").collect()[0]
    print(f"    page:     L={pg['l']:.1f}  z={pg['z']:.4f}"
          "  (do they rise in the hypothesized order?)")
    print("all steps ran")
    spark.stop()


if __name__ == "__main__":
    main()
