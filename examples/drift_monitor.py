"""Corpus drift monitor — the report a data-pipeline on-call reads
when a new snapshot lands: did the value distribution move (exact
two-sample KS + Mann-Whitney), did the category mix move (chi-square
cells + PSI), and how concentrated is the mix now (Simpson/
Berger-Parker)?  Everything except PSI is hash-exact integer algebra
(`operators.robust`, `llm.report`), so two runs — or two engines —
agree to the bit.

Run: python examples/drift_monitor.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.llm.report import (
    category_drift,
    psi_drift,
    simpson_diversity,
)
from hadron_spark.operators.robust import ks_two_sample, mann_whitney_u
from hadron_spark.sources.taps import Tap


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("drift_monitor_example")

    ev = Tap([f"{sf_dir}/events.parquet"], "parquet").read(spark).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # "old snapshot" vs "new snapshot": the deterministic even/odd
    # split stands in for last week's load vs this week's
    new = ev.filter(F.col("event_id") % 2 == 0)
    old = ev.filter(F.col("event_id") % 2 == 1)

    print("[1] KS shape drift per event type (exact D):")
    for r in (
        ks_two_sample(new, old, "cents", ["event_type"])
        .orderBy(F.col("d").desc())
        .collect()
    ):
        print(
            f"    {r['event_type']:<12} D={r['d']:.5f} at value "
            f"{r['at_value']} (n={r['n_new']}/{r['n_old']})"
        )

    print("[2] Mann-Whitney location drift (tie-corrected z):")
    for r in (
        mann_whitney_u(new, old, "cents", ["event_type"])
        .orderBy("event_type")
        .collect()
    ):
        print(f"    {r['event_type']:<12} U={r['u']:.1f} z={r['z']:+.3f}")

    print("[3] event-type mix drift (chi-square cells, exact):")
    for r in (
        category_drift(new, old, "event_type")
        .orderBy(F.col("chi2_cell").desc())
        .collect()
    ):
        print(
            f"    {r['category']:<12} {r['share_old']:.4f} -> "
            f"{r['share_new']:.4f}  chi2_cell={r['chi2_cell']:.4f}"
        )

    print("[4] PSI cells (Laplace-smoothed; >0.25 summed = major):")
    psi = psi_drift(
        new.select(F.expr("cents div 5000").alias("bin")),
        old.select(F.expr("cents div 5000").alias("bin")),
        "bin",
    ).collect()
    total = sum(r["psi_cell"] for r in psi)
    print(f"    {len(psi)} value-band cells, summed PSI = {total:.6f}")

    print("[5] mix concentration (exact Simpson / Berger-Parker):")
    for r in simpson_diversity(ev, "event_type").collect():
        print(
            f"    {r['n_categories']} types over {r['n']} events: "
            f"simpson={r['simpson']:.4f} top_share={r['top_share']:.4f}"
        )

    spark.stop()
    print("drift monitor done")


if __name__ == "__main__":
    main()
