"""Time a subset of registry queries exactly the way bench.py does
(noop sink, untimed warm-up, min of N timed iterations, GC between) —
the per-change measurement loop of the optimization rounds.

Usage: SPARK_GRAFT_CPUS=32 python tools/time_queries.py [-n N] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    iters = 2
    if args and args[0] == "-n":
        iters = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hadron_spark import get_spark
    from hadron_spark.queries import QUERIES

    spark = get_spark("time_queries")

    def release_pins() -> None:
        # blocking-unpersist leftover localCheckpoint pins in the
        # UNTIMED gaps — same hygiene as bench.release_pins: a prior
        # cell's pinned table must not squeeze the next cell's joins
        try:
            # .values() is a Python ValuesView (py4j MutableMapping)
            for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                rdd.unpersist(True)
        except Exception:
            pass

    out = {}
    for name in args:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_pins()
        spark._jvm.System.gc()
        best = None
        for i in range(iters):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f} s", flush=True)
        release_pins()
        spark._jvm.System.gc()
    spark.stop()
    print("TIMEJSON:" + json.dumps(out))


if __name__ == "__main__":
    main()
