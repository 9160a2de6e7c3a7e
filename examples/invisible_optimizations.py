"""The invisible-optimization tier: three operators that change the
PLAN, never the RESULT — each is timed against its naive counterpart
and checked for exact row equality.

1. Bloom pre-filter join (joins.bloom_prefilter_join): drop fact rows
   that cannot match before the join shuffle.
2. CMS-screened exact frequent items (sketch.frequent_items_exact):
   exact GROUP BY ... HAVING, but the expensive shuffle only carries
   sketch-surviving candidates.
3. Salted skew join (ops.salted_join): hot keys spread over many
   tasks.

At sf0.1 on one machine the wins are modest or nil — the point of
this example is the EQUALITY check and the plan shape; the wins
appear when the fact side is large enough that its shuffle dominates.

Run: python examples/invisible_optimizations.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.operators.joins import bloom_prefilter_join
from hadron_spark.operators.ops import salted_join
from hadron_spark.operators.sketch import frequent_items_exact
from hadron_spark.sources.taps import Tap


def timed(label, fn):
    t0 = time.time()
    n = fn()
    print(f"  {label:<28} {n:>8} rows   {time.time() - t0:6.2f}s")
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("invisible_opts")

    li = Tap([f"{sf_dir}/lineitem.parquet"]).read(spark)
    part = Tap([f"{sf_dir}/part.parquet"]).read(spark).filter(F.col("p_size") <= 2)

    print("bloom pre-filter join vs plain join")
    a = timed("bloom_prefilter_join", lambda: bloom_prefilter_join(
        li, part, "l_partkey", "p_partkey").count())
    b = timed("plain join", lambda: li.join(
        part, li.l_partkey == part.p_partkey).count())
    assert a == b, "bloom changed the result!"

    print("CMS-screened exact frequents vs naive GROUP BY ... HAVING")
    a = timed("frequent_items_exact", lambda: frequent_items_exact(
        li.select("l_partkey"), "l_partkey", 40).count())
    b = timed("naive having", lambda: li.groupBy("l_partkey").count()
              .filter(F.col("count") >= 40).count())
    assert a == b, "sketch screen changed the result!"

    print("salted join vs plain join (skew-proofing)")
    orders = Tap([f"{sf_dir}/orders.parquet"]).read(spark)
    cust = Tap([f"{sf_dir}/customer.parquet"]).read(spark).select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    a = timed("salted_join", lambda: salted_join(
        orders, cust, ["o_custkey"]).count())
    b = timed("plain join", lambda: orders.join(cust, "o_custkey").count())
    assert a == b, "salting changed the result!"

    print("all three optimizations verified invisible")
    spark.stop()


if __name__ == "__main__":
    main()
