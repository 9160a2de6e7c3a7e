"""Publish gate — the contract check every snapshot pipeline runs
before promoting data (`operators.expectations`): a declarative
suite compiled to ONE scan per table plus cross-table referential
integrity, ending in a gate that raises with the failing checks
named (wire it before the final rename and bad snapshots never go
live).

1. column contracts over orders — null/unique/range/enum/regex in a
   single aggregate pass;
2. `foreign_key` — orders.custkey ⊆ customer.custkey,
   lineitem.orderkey ⊆ orders.orderkey;
3. grouped mode — per-orderpriority violation profile (where do the
   bad rows concentrate);
4. `fail_on_violations` — the blocking gate, demonstrated on a suite
   with a deliberately impossible range.

Run: python examples/publish_gate.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.operators.expectations import (
    accepted_values,
    custom,
    expect,
    fail_on_violations,
    foreign_key,
    in_range,
    matches,
    not_null,
    unique,
)
from hadron_spark.sources.taps import Tap


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("publish_gate_example")
    o = Tap([f"{sf_dir}/orders.parquet"], "parquet").read(spark)
    c = Tap([f"{sf_dir}/customer.parquet"], "parquet").read(spark)
    li = Tap([f"{sf_dir}/lineitem.parquet"], "parquet").read(spark)

    suite = [
        not_null("o_custkey"),
        unique("o_orderkey"),
        in_range("o_totalprice", 0, 600000),
        accepted_values("o_orderstatus", ["O", "F", "P"]),
        matches("o_orderpriority", "^[1-5]-"),
        custom(
            "future_orders",
            "o_orderdate",
            F.col("o_orderdate") >= F.lit("2002-01-01").cast("timestamp"),
        ),
    ]
    print("== 1. column contracts (one scan) ==")
    report = expect(o, suite)
    report.show(10, truncate=False)

    print("== 2. referential integrity ==")
    fk = foreign_key(o, "o_custkey", c, "c_custkey").unionByName(
        foreign_key(li, "l_orderkey", o, "o_orderkey")
    )
    fk.show(truncate=False)

    print("== 3. per-priority violation profile ==")
    expect(o, [in_range("o_totalprice", 0, 200000)], ["o_orderpriority"]).orderBy(
        "o_orderpriority"
    ).show(10, truncate=False)

    print("== 4. the gate: a clean suite passes ... ==")
    fail_on_violations(report.unionByName(fk))
    print("   clean suite passed")
    print("   ... and an impossible range is BLOCKED:")
    try:
        fail_on_violations(expect(o, [in_range("o_totalprice", 0, 1)]))
    except AssertionError as e:
        print(f"   blocked as expected: {e}")

    print("publish_gate: all 4 stages completed")
    spark.stop()


if __name__ == "__main__":
    main()
