"""Round-4 extended-session SCALE ladder: the ops added after the
round-4-late probe — WordPiece encoding (vocabulary-bounded encode +
corpus join-back), the banded interval-overlap join (explode factor =
span/W), the two-sample KS/Mann-Whitney spine (distinct-value-bounded
downstream), and Kendall tau cells (bounded-cell contract).  APPENDS
to SCALE.md (the main probe rewrites it; extensions append).

Ladders replicate rows with disjoint id spaces (the r3 semantics):
docs ladder for WordPiece, events ladder for intervals/KS/MW, and a
lineitem ladder for Kendall.  Every op's claim is wall ~linear in
input (the interval join: linear in candidate pairs, which the
disjoint-user replication keeps linear too).

Run: python tools/scale_probe_r4ext.py [sf_dir] [k1,k2,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scale_probe import blow_up  # same replica semantics as r3


def main() -> None:
    from hadron_spark import get_spark
    from hadron_spark.llm.wordpiece import wordpiece_encode
    from hadron_spark.operators.joins import interval_join
    from hadron_spark.operators.robust import (
        kendall_tau_b,
        ks_two_sample,
        mann_whitney_u,
    )
    from hadron_spark.queries import _WP_VOCAB

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ks = [
        int(x)
        for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["1", "4", "16"])
    ]
    spark = get_spark("scale_probe_r4ext")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    ev_base = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )
    li_base = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_orderkey"
    )

    def blow_up_ev(e, k: int):
        parts = [
            e.select(
                (F.col("event_id") + F.lit(r * 1_000_000_000_000)).alias(
                    "event_id"
                ),
                (F.col("user_id") + F.lit(r * 1_000_000_000)).alias("user_id"),
                "event_type",
                "value",
            )
            for r in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def blow_up_li(li, k: int):
        parts = [
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(r * 1_000_000_000)
            )
            for r in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def probe_wordpiece(d):
        return (
            wordpiece_encode(d, "text", _WP_VOCAB)
            .agg(F.sum("n_tokens"))
            .collect()[0][0]
        )

    def probe_interval(e):
        base = e.select(
            "event_id",
            "user_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("lo"),
            (
                F.round(F.col("value") * 100).cast("long")
                + F.col("event_id") % 1000
            ).alias("hi"),
        )
        l = base.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("l_id"),
            F.col("user_id").alias("l_user"),
            F.col("lo").alias("l_lo"),
            F.col("hi").alias("l_hi"),
        )
        r = base.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("r_id"),
            F.col("user_id").alias("r_user"),
            F.col("lo").alias("r_lo"),
            F.col("hi").alias("r_hi"),
        )
        return interval_join(
            l, r, "l_lo", "l_hi", "r_lo", "r_hi", band_width=500,
            equi_on=[("l_user", "r_user")],
        ).count()

    def probe_ks_mw(e):
        v = e.select(
            "event_type",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
        new = v.filter(F.col("event_id") % 2 == 0)
        old = v.filter(F.col("event_id") % 2 == 1)
        n1 = ks_two_sample(new, old, "v", ["event_type"]).count()
        n2 = mann_whitney_u(new, old, "v", ["event_type"]).count()
        return n1 + n2

    def probe_kendall(li):
        q = li.select(
            "l_returnflag",
            F.round("l_quantity").cast("long").alias("x"),
            F.expr(
                "cast(round(l_extendedprice * 100) as bigint) div 200000"
            ).alias("y"),
        )
        return kendall_tau_b(q, "x", "y", ["l_returnflag"]).count()

    doc_results: dict[int, tuple[float, int]] = {}
    ev_results: dict[str, dict[int, tuple[float, int]]] = {
        "interval_join_w500": {},
        "ks+mw_spine": {},
    }
    li_results: dict[int, tuple[float, int]] = {}
    for k in ks:
        d = blow_up(docs, k).repartition(32).localCheckpoint()
        t0 = time.time()
        n = probe_wordpiece(d)
        doc_results[k] = (round(time.time() - t0, 2), int(n))
        d.unpersist()
        e = blow_up_ev(ev_base, k).repartition(32).localCheckpoint()
        for name, fn in (
            ("interval_join_w500", probe_interval),
            ("ks+mw_spine", probe_ks_mw),
        ):
            t0 = time.time()
            n = fn(e)
            ev_results[name][k] = (round(time.time() - t0, 2), int(n))
        e.unpersist()
        li = blow_up_li(li_base, k).repartition(32).localCheckpoint()
        t0 = time.time()
        n = probe_kendall(li)
        li_results[k] = (round(time.time() - t0, 2), int(n))
        li.unpersist()

    lines = [
        "",
        "## Round-4 extended-session ops (ks=" + str(ks) + "; disjoint-id",
        "replication — wordpiece out = total tokens, interval join out =",
        "overlap pairs (linear: users are disjoint across replicas),",
        "ks+mw out = 2x group count, kendall out = groups):",
        "",
        "| op | " + " | ".join(f"k={k} wall / out" for k in ks) + " | wall × |",
        "|---|" + "---|" * (len(ks) + 1),
    ]

    def row(name, r):
        ratio = r[max(ks)][0] / max(r[min(ks)][0], 0.01)
        return (
            f"| {name} | "
            + " | ".join(f"{r[k][0]:.2f}s / {r[k][1]:,}" for k in ks)
            + f" | {ratio:.1f}× |"
        )

    lines.append(row("wordpiece_encode", doc_results))
    for name, r in ev_results.items():
        lines.append(row(name, r))
    lines.append(row("kendall_tau_cells", li_results))
    lines.append("")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"
    )
    with open(path, "a") as fh:
        fh.write("\n".join(lines))
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
