"""Full-registry physical-plan lint: build EVERY registry query's
plan and scan it for the scale red flags the per-query pins in
test_plans check selectively — the automated version of the
"explain and iterate" discipline.

Red flags and how they are cleared:

  - CartesianProduct — never acceptable, no allowlist.
  - Exchange SinglePartition — AUTO-SAFE when its immediate child is
    a ``partial_`` aggregate (the standard two-phase global-aggregate
    shape: the exchange moves ~#partitions pre-combined rows, not
    data).  Otherwise it concentrates a frame on one task and needs a
    per-query justification proving the frame is bounded (e.g. a
    global window over a post-aggregate frame whose group key has
    small cardinality: months, nations, deciles).
  - BroadcastNestedLoopJoin — AUTO-SAFE when the broadcast subtree
    contains a keyless (global) aggregate, i.e. the build side is a
    1-row total.  Otherwise needs a per-query justification proving
    the build side is bounded (band dims, salt spines, aggregated
    month/decile frames the plan cannot prove small).
  - unpartitioned Window — Spark's WindowExec toString omits empty
    specs, so this is detected via its mandatory SinglePartition
    exchange (above), not a regex on the Window line.

Also records per-query shuffle / broadcast-join / sort-merge-join
counts so plan drift between rounds is diffable.  Writes PLANLINT.md
(including the justification table) and exits non-zero on any
UNEXPLAINED red flag.

Run: python tools/plan_lint.py [sf_dir]   (~minutes: side-effecting
queries — streaming sinks, fan-outs — execute during construction).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Per-query justifications for flags the plan alone cannot prove
# bounded.  Each entry must say WHY the concentrated/broadcast frame
# stays small at 100 TB — "it passed at sf0.001" is not a reason.
EXPLAIN_BNLJ = {
    "q25_ann_bruteforce": "brute-force ANN baseline by contract: broadcasts the bounded "
    "query set (k rows); the scale path is IVF/PQ (q41/q191/q192)",
    "q275_ann_recall": "recall audit runs the q25 brute-force baseline as ground truth "
    "by contract: broadcasts the bounded query set (50 rows); the audited IVF side is "
    "the scale path",
    "q286_crosstab_chi2": "deliberate r x c marginal cross join: both sides are the "
    "category marginals of the contingency table (bounded by the categorical contract), "
    "crossed to emit ZERO cells that still carry expected mass",
    "q292_lift_table": "triangular cumulative join over the per-tile aggregate "
    "(n_buckets=10 rows both sides by construction of ntile)",
    "q304_token_budget_curve": "same tile-triangle as q292: cumulative join over "
    "the per-tile token/quality aggregate (n_buckets=10 rows both sides)",
    "q241_semantic_contamination": "broadcasts the benchmark embedding set (MB-scale "
    "by contract — eval suites are thousands of rows against a 100 TB corpus); the "
    "corpus side streams and the per-doc max partial-aggregates map-side",
    "q43_range_join": "broadcasts the band-boundary dim (O(#bands) rows); the fact side "
    "streams — point-in-interval against a literal bucket spec",
    "q92_max_concurrency": "triangular running join over the per-month aggregate "
    "(O(#months) rows both sides after groupBy)",
    "q143_skyline_orders": "triangular dominance join over the per-latency-day aggregate "
    "(O(distinct latency days) rows, bounded by date arithmetic)",
    "q168_vocab_growth": "triangular cumulative join over the per-decile aggregate "
    "(10 rows by construction of ntile(10))",
    "q102_salted_join_rollup": "deliberate salting demo: crosses the fact with the "
    "O(#salts) spine (range(n_salt)) to replicate the hot dim",
    "q36_jaccard_pairs": "bounded candidate set by contract (doc_id<40 cap documented "
    "in the query)",
    "q191_pq_topk": "broadcasts the PQ codebook distance table (m x 256 entries, "
    "model state, corpus-size independent)",
    "q193_exact_percentiles": "broadcasts the O(#requested percentiles) rank targets "
    "against the per-bucket offset table (O(#buckets))",
    "q195_group_percentiles": "broadcasts the O(#groups x #percentiles) rank targets; "
    "groups = returnflag/linestatus (cardinality 6)",
    "q315_jonckheere_terpstra": "deliberate value-spine x group-set grid: the "
    "broadcast side is the DISTINCT GROUP list (k rows — the test's arms, never "
    "corpus-scale); the spine side is |distinct quantized values|-bounded",
    "q318_dunn_posthoc": "pairwise theta self-join over the PER-GROUP rank "
    "aggregate: both sides are k rows (the test's arms), broadcast side "
    "explicit; output k(k-1)/2 pair rows",
    "q319_cliffs_delta": "the q315 value-spine x group-set grid: broadcast "
    "side is the DISTINCT GROUP list (k rows), spine side |distinct "
    "quantized values|-bounded — never an all-pairs value join",
    "q327_conover_iman": "the q318 pairwise shape: a.g < b.g self-join over "
    "the PER-GROUP rank aggregate (k rows both sides — the test's arms), "
    "output k(k-1)/2 pair rows",
    "q341_mmr_rerank": "the q25 brute-force baseline feeding MMR: broadcasts "
    "the bounded probe set (5 rows); candidates are top-50 per probe by "
    "contract — the corpus side streams",
    "q348_isotonic_calibrate": "the minimax PAV block triangle: i <= j "
    "self-join of the DISTINCT-SCORE spine (~50 value bands both sides — "
    "the quantization contract), |spine|²/2 block rows, never label rows",
}
EXPLAIN_SINGLE_PARTITION = {
    "q79_share_of_total": "global share window over the per-nation aggregate "
    "(25 rows — nation-key cardinality)",
    "q90_mom_growth": "lag window over the per-month aggregate (O(#months))",
    "q94_pareto_brands": "cumulative-share window over the per-brand aggregate "
    "(O(#brands), bounded dim)",
    "q103_share_of_parent": "share windows over region/nation aggregates "
    "(5/25 rows)",
    "q108_cumulative_distinct_customers": "cumulative window over the per-month "
    "first-order aggregate (O(#months))",
    "q126_benford_audit": "share-of-total window over the 9-row leading-digit "
    "aggregate",
    "q152_activity_heatmap": "share window over the 7x24 day-hour aggregate "
    "(168 rows)",
    "q153_largest_remainder": "largest-remainder seat assignment over the "
    "O(#parties) aggregate",
    "q155_revenue_autocorr": "lag window over the per-month revenue aggregate "
    "(O(#months))",
    "q156_churn_hazard": "cumulative-survival window over the per-gap-week "
    "aggregate (O(#weeks))",
    "q160_bollinger_bands": "rolling stats window over the per-day price "
    "aggregate (O(#days))",
    "q313_page_trend": "row_number window over the DISTINCT-TREATMENT set "
    "(k rows — 3 here; treatments are the repeated-measures arms, never "
    "corpus-scale) deriving the hypothesized positions when order=None",
    "q330_mood_median": "grand-median cumulative window over the "
    "DISTINCT-VALUE cell spine (|distinct n_chars| rows — the quantization "
    "contract), never corpus rows; group_cols partitions it when set",
    "q332_bh_fdr": "BH rank + reverse-running-min windows over the TEST "
    "FAMILY (50 strata here; the post-hoc tables this adjusts are "
    "k(k-1)/2-bounded by contract), never corpus rows; family_cols "
    "partitions when set",
    "q348_isotonic_calibrate": "prefix-sum window over the DISTINCT-SCORE "
    "spine (~50 value bands — the quantization contract), never label "
    "rows; the pair frame and suffix-min window partition by (group, "
    "start-score)",
}


def _indent(line: str) -> int:
    i = 0
    for ch in line:
        if ch in " :+-|":
            i += 1
        else:
            break
    return i


def _subtree(lines: list[str], i: int) -> list[str]:
    d = _indent(lines[i])
    out = []
    for j in range(i + 1, len(lines)):
        if _indent(lines[j]) <= d:
            break
        out.append(lines[j])
    return out


def audit(plan: str) -> dict:
    """Count plan operators; return counts + per-class UNSAFE hits
    (flags not cleared by the structural auto-safe rules)."""
    lines = plan.splitlines()
    n = {"sh": 0, "1p": 0, "bhj": 0, "smj": 0, "bnlj": 0, "cart": 0}
    unsafe_1p = 0
    unsafe_bnlj = 0
    for i, ln in enumerate(lines):
        if "Exchange hashpartitioning" in ln or "Exchange rangepartitioning" in ln:
            n["sh"] += 1
        if "BroadcastHashJoin" in ln:
            n["bhj"] += 1
        if "SortMergeJoin" in ln:
            n["smj"] += 1
        if "CartesianProduct" in ln:
            n["cart"] += 1
        if "Exchange SinglePartition" in ln:
            n["1p"] += 1
            # auto-safe: immediate child is a partial aggregate (the
            # two-phase global-agg final exchange — moves ~#partitions
            # combined rows, not data)
            sub = _subtree(lines, i)
            child = sub[0] if sub else ""
            if not ("Aggregate" in child and "partial_" in child):
                unsafe_1p += 1
        if "BroadcastNestedLoopJoin" in ln:
            n["bnlj"] += 1
            # auto-safe: the broadcast subtree contains a keyless
            # (global) aggregate => the build side is a 1-row total
            sub = _subtree(lines, i)
            bx = next(
                (j for j, s in enumerate(sub) if "BroadcastExchange" in s), None
            )
            build = sub[bx:] if bx is not None else sub
            if not any(
                "Aggregate(keys=[], " in s or "Aggregate(key=[], " in s
                for s in build
            ):
                unsafe_bnlj += 1
    return {**n, "unsafe_1p": unsafe_1p, "unsafe_bnlj": unsafe_bnlj}


def main() -> None:
    from hadron_spark import get_spark
    from hadron_spark.queries import ORACLES, QUERIES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_lint")
    rows = []
    violations = []
    explained = []
    for name, fn in QUERIES.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — lint must survive one bad query
            rows.append((name, "ERROR", str(e).splitlines()[0][:100]))
            violations.append((name, "build-error"))
            continue
        a = audit(plan)
        flags = []
        if a["cart"]:
            flags.append((f"CARTESIAN x{a['cart']}", None))
        if a["unsafe_bnlj"]:
            flags.append(
                (f"BNLJ x{a['unsafe_bnlj']}", EXPLAIN_BNLJ.get(name))
            )
        if a["unsafe_1p"]:
            flags.append(
                (
                    f"SinglePartition x{a['unsafe_1p']}",
                    EXPLAIN_SINGLE_PARTITION.get(name),
                )
            )
        bad = [f for f, why in flags if why is None]
        if bad:
            violations.append((name, ", ".join(bad)))
        for f, why in flags:
            if why is not None:
                explained.append((name, f, why))
        rows.append(
            (
                name,
                f"sh={a['sh']} 1p={a['1p']} bhj={a['bhj']} smj={a['smj']} "
                f"bnlj={a['bnlj']} cart={a['cart']} "
                f"[{time.time() - t0:.1f}s]",
                ", ".join(f for f, _ in flags) if flags else "",
            )
        )
    lines = [
        "# PLANLINT — automated full-registry plan audit",
        "",
        f"Generated by `python tools/plan_lint.py {sf_dir}` over "
        f"{len(QUERIES)} registry queries ({len(ORACLES)} oracle-backed).",
        "",
        "Red flags: CartesianProduct (never allowed); "
        "`Exchange SinglePartition` NOT directly above a partial aggregate "
        "(the two-phase global-agg shape is auto-safe: it moves "
        "~#partitions combined rows); `BroadcastNestedLoopJoin` whose "
        "broadcast side is NOT a keyless 1-row aggregate.  Flags that "
        "survive the structural rules need a per-query justification "
        "proving the concentrated/broadcast frame is bounded at 100 TB — "
        "listed in the justification table below.",
        "",
        "| query | plan counters | flags (explained below) |",
        "|---|---|---|",
    ]
    for name, counters, flags in rows:
        lines.append(f"| {name} | {counters} | {flags} |")
    if explained:
        lines += [
            "",
            "## Justified flags (bounded-frame proofs)",
            "",
            "| query | flag | why it is bounded at scale |",
            "|---|---|---|",
        ]
        for name, f, why in explained:
            lines.append(f"| {name} | {f} | {why} |")
    lines += [
        "",
        f"**Unexplained red flags: {len(violations)}**"
        + (
            ""
            if not violations
            else " — " + "; ".join(f"{n} ({f})" for n, f in violations)
        ),
        "",
    ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANLINT.md",
    )
    open(out, "w").write("\n".join(lines))
    print("\n".join(lines[-3:]))
    spark.stop()
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
