"""Generate PLANS.md: the formatted physical plans of representative
queries, with the plan property each one is expected to exhibit.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

# query → the plan property it demonstrates
SHOWCASE = {
    "q01_pricing_summary": "partial (map-side) aggregation before the single exchange; filter + column pruning pushed to the parquet scan",
    "q03_filter_project": "fully narrow plan — PushedFilters + pruned ReadSchema, no exchange",
    "q04_topk_orders": "TakeOrderedAndProject (per-partition heap), never a global sort",
    "q07_join_nway_revenue": "both dimension sides broadcast (BroadcastHashJoin ×2), lineitem streamed, partial agg before exchange",
    "q20_asof_join": "as-of join as union + single window pass — no range-condition nested loop",
    "q26_minhash_pairs": "signature table cached (InMemoryTableScan), band-key equi-self-join, no cartesian anywhere",
    "q48_hash_split": "deterministic md5 bucketing is a narrow projection — no shuffle before the final count",
    "q52_contamination": "gram explode is codegen (no interpreted lambda); contamination is an equi-join on the gram, shuffle keyed by gram",
    "q61_tfidf_topk": "per-doc top-k pushed into the window (WindowGroupLimit); 1-row corpus count broadcast; tf table persisted once for both df-aggregate and join probe",
    "q66_collocations": "global top-k is TakeOrderedAndProject after the dictionary joins; unigram dictionary persisted and reused on both join sides",
    "q73_outlier_trim": "per-group quantile bounds (|groups| rows) broadcast back — the fact table is never shuffled before the final aggregate",
    "q74_unpivot": "unpivot is an Expand node — narrow, no exchange until the aggregation",
    "q119_zscore_outliers": "per-type moment table broadcast back onto the event scan — one real exchange (the aggregation), z computed in codegen",
    "q121_locf_resample": "grid join and LOCF window share the user-key partitioning — the fill pass adds no exchange over the densify",
    "q129_bloom_prefilter_join": "two broadcast bitmap probes drop fact rows BEFORE the real join's exchange — runtime-filter shape, bloom invisible in results",
    "q148_qty_discount_corr": "correlation from exact integer moments: broadcast dim join, ONE partial-agg'd exchange onto brand keys, all six moment sums in a single codegen'd aggregate",
    "q153_largest_remainder": "Hamilton apportionment: the fact partial-aggregates onto ~25 nation keys; every later window (total, remainder rank, shortfall) runs single-partition on that 25-row frame",
    "q159_multi_sourcing": "shrinking-shuffle discipline: part×nation distinct dedups map-side (partial HashAggregate before its exchange); each subsequent shuffle carries strictly fewer rows",
    "q154_segment_migration": "range_rank r2 shape: per-year ranking input materialized once (Scan ExistingRDD), band offsets as a literal array — ONE exchange per ranking, no SinglePartition anywhere",
    "q176_crawl_pipeline": "entire HTML→dedup→redact→gate hygiene chain fused into the scan stage; the ONLY exchange is the partial-agg'd per-source accounting",
    "q183_pack_sequences": "sequence packing: banded prefix-sum window (literal-array band offsets, never SinglePartition) + narrow sequence() explode — one exchange at any corpus size",
    "q185_gram_matrix": "exact Gram: MapInPandas X'X partials, then ONE partial-agg'd exchange of O(batches·d²) rows — the corpus side never exchanges",
    "q193_exact_percentiles": "exact percentiles without a global sort: banded range_rank exchange + broadcast 5-row percentile spine; no SinglePartition window",
    "q194_mixture_upsample": "repeat-factor upsampling is FULLY NARROW: md5 bucket filter + sequence() explode, zero exchanges",
    "q200_training_data_capstone": "upsample∘pack∘shard capstone: the narrow upsample explode fuses into the packer's materialize pass; exchanges = prefix-sum band window + final shard rollup only",
    "q204_quality_classifier": "model-based quality scoring is FULLY NARROW: exact-int-ratio features + literal-weight linear score fused into the scan, no exp(), zero exchanges before the ordering",
    "q208_repeated_spans": "exact-substring dedup: fingerprint partial-agg count and the position re-join share the fp key (exchange reuse); island merge is a doc-partitioned window — no SinglePartition anywhere",
    "q202_dsir_scores": "DSIR scoring: n-gram explode partial-aggregates onto (doc,bucket); the B-bounded log-ratio map is BroadcastHashJoin'd — the corpus-side per-doc sum is the only real exchange",
    "q272_bradley_terry": "iterative MM fit: outcomes partial-aggregate ONCE to the pair spine; each round is one spine join + one items-keyed exchange over localCheckpoint'd (lineage-truncated) strengths — the corpus never re-enters",
    "q328_mann_kendall": "kendall cell-grid shape: corpus partial-aggregates to bounded (day,band) cells; the pair algebra is a cell self-join keyed on the group — S never touches raw rows",
    "q336_cusum_changepoint": "per-series window prefix + all-integer argmax via partial-agg'd struct-max — frames bounded by series length, no SinglePartition",
    "q348_isotonic_calibrate": "loop-free PAV: spine prefix window + i<=j spine triangle + suffix-min window partitioned by (start score) — label rows touched exactly once at the spine aggregate",
    "q355_expectations": "six-check suite compiled to ONE scan: every predicate a conditional sum in a single partial-agg'd aggregate (plus the exact count-distinct), then a literal-array explode of the report rows",
    "q357_ols_fit": "Cramer-exact OLS: all X'X / X'y moments in ONE codegen'd aggregate (one exchange onto |groups| rows); the 3×3 determinant solve is scalar expressions on the output rows",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from hadron_spark import get_spark
    from hadron_spark.queries import QUERIES

    spark = get_spark("dump_plans")
    out = [
        "# PLANS — physical plans of representative queries",
        "",
        f"Auto-generated by `python tools/dump_plans.py {sf_dir}`",
        "(re-run after changing an operator; the annotations state the",
        "property each plan is expected to exhibit).",
        "",
    ]
    for name, why in SHOWCASE.items():
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # strip expr ids (#123) so regeneration diffs stay readable
        plan = re.sub(r"#\d+L?", "#_", plan)
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Expected:** {why}")
        out.append("")
        out.append("```")
        out.append(plan.rstrip()[:4000])
        out.append("```")
        out.append("")
    # shuffle census: one row per registry query — the at-a-glance
    # answer to "does this operator shuffle more than it must?"
    out.append("## Shuffle census (all registry queries)")
    out.append("")
    out.append("Executed-plan node counts at this SF (AQE initial plan;")
    out.append("broadcast counts include AQE-converted joins). Streaming")
    out.append("and iterative queries execute during planning and are")
    out.append("censused by their final/driving plan.")
    out.append("")
    out.append("| query | exchanges | broadcasts | scans | notes |")
    out.append("|---|---|---|---|---|")
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover
            out.append(f"| {name} | — | — | — | error: {str(e)[:60]} |")
            continue
        ex = len(re.findall(r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)", plan))
        bc = plan.count("BroadcastExchange")
        # every FileScan node prints "Scan parquet" exactly once
        sc = plan.count("Scan parquet")
        notes = []
        for marker in ("TakeOrderedAndProject", "WindowGroupLimit", "Expand",
                       "InMemoryTableScan", "FlatMapGroupsInPandas", "MapInPandas"):
            if marker in plan:
                notes.append(marker)
        out.append(f"| {name} | {ex} | {bc} | {sc} | {', '.join(notes)} |")
    out.append("")
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans + census)")
    spark.stop()


if __name__ == "__main__":
    main()
