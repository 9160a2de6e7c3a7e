"""Round-5 SCALE rung (VERDICT r4 #3, last clause): the no-equi-key
point-in-interval join — banded `bucketize_range_join` vs the bare
theta `range_join` (which Catalyst can only plan as a broadcast
nested loop when no equi key exists).

Ladder: customers (points) and suppliers (±200-unit balance windows)
replicate with DISJOINT VALUE OFFSETS per replica (replica r shifts
both sides by r·10^7 cents), so true matches only occur within a
replica and the OUTPUT grows linearly in k.  That isolates the join
strategy: the banded join's work is candidates-per-band (linear
here), while BNLJ evaluates the predicate on the full |L|×|R| cross
— quadratic in k no matter how sparse the matches.  BNLJ rungs are
capped (they'd be minutes at k=8; that cliff is the point).

APPENDS a table to SCALE.md.

Run: SPARK_DRIVER_MEMORY=48g python tools/scale_probe_r5.py [sf_dir] [k1,k2,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from hadron_spark import get_spark
    from hadron_spark.operators.joins import bucketize_range_join, range_join

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ks = [
        int(x)
        for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["1", "4", "16"])
    ]
    bnlj_cap = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark("scale_probe_r5")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", F.round(F.col("c_acctbal") * 100).cast("long").alias("pt")
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey",
        (F.round(F.col("s_acctbal") * 100).cast("long") - 20000).alias("lo"),
        (F.round(F.col("s_acctbal") * 100).cast("long") + 20000).alias("hi"),
    )

    def ladder(df, k, cols_shift, key):
        parts = [
            df.select(
                (F.col(key) + F.lit(r * 1_000_000_000)).alias(key),
                *[
                    (F.col(c) + F.lit(r * 10_000_000)).alias(c)
                    for c in cols_shift
                ],
            )
            for r in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    rows = []
    for k in ks:
        c = ladder(cust, k, ["pt"], "c_custkey").persist()
        s = ladder(supp, k, ["lo", "hi"], "s_suppkey").persist()
        nc, ns = c.count(), s.count()
        t0 = time.time()
        n_band = bucketize_range_join(
            c, s, "pt", "lo", "hi", band_width=10000
        ).count()
        t_band = time.time() - t0
        if k <= bnlj_cap:
            t0 = time.time()
            n_bnlj = range_join(c, s, F.col("pt"), F.col("lo"), F.col("hi")).count()
            t_bnlj = time.time() - t0
            assert n_bnlj == n_band, (n_bnlj, n_band)
            bnlj_cell = f"{t_bnlj:.2f}s"
        else:
            bnlj_cell = "— (capped)"
        rows.append((k, nc, ns, n_band, f"{t_band:.2f}s", bnlj_cell))
        print(rows[-1], flush=True)
        c.unpersist()
        s.unpersist()

    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"),
        "a",
    ) as f:
        f.write(
            "\n## Round-5 rung: bucketize_range_join vs bare-theta BNLJ"
            "\n(disjoint value offsets per replica — matches stay"
            " within replicas, output linear in k; BNLJ still pays the"
            " full |L|x|R| cross):\n\n"
            "| k | points | intervals | out pairs | banded wall | BNLJ wall |\n"
            "|---|---|---|---|---|---|\n"
        )
        for k, nc, ns, n, tb, tj in rows:
            f.write(f"| {k} | {nc:,} | {ns:,} | {n:,} | {tb} | {tj} |\n")
    print("SCALE.md appended")
    spark.stop()


if __name__ == "__main__":
    main()
