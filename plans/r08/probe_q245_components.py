"""Component profile of q245_triangle_count at sf0.1 (largest bench
cell): edge build, canon distinct, oriented pin, wedge+closing join,
final counts.  Measurement-only.
Usage: SPARK_GRAFT_CPUS=32 python plans/r08/probe_q245_components.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.operators import graph
from hadron_spark.queries import QUERIES, load

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe_q245")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def release():
    try:
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist(True)
    except Exception:
        pass


def timed(label, fn):
    # warm + min of 2 timed, bench discipline
    fn(); release()
    best = None
    for _ in range(2):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        release()
    print(f"{label:32s} {best:7.3f}s")


def edges():
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    return (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    )


print("rows:",
      edges().count(), "edge pairs;",
      graph._canon(edges()).count(), "canonical edges")
release()
timed("edge build (pairs)", lambda: noop(edges()))
timed("canon distinct", lambda: noop(graph._canon(edges())))
timed("canon+degree+peel+orient", lambda: noop(
    graph._triangle_frame(graph._canon(edges()))))
timed("full q245", lambda: noop(QUERIES["q245_triangle_count"](spark, sf_dir)))
spark.stop()
