"""Profile q31's availableNow micro-batch machinery (VERDICT r07 #4):
batch count and per-batch duration breakdown from StreamingQueryProgress.
Measurement-only; mirrors run_stream_to_memory with the query object
exposed.  Usage: SPARK_GRAFT_CPUS=32 python plans/r08/probe_q31_stream.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.queries import dsum, events_stream
from hadron_spark.streaming import windowed_agg

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe_q31")

for tag in ("warm", "timed"):
    ev = events_stream(spark, sf_dir, "probe31_")
    agg = windowed_agg(
        ev, "ts", "5 minutes", ["event_type"],
        [F.count(F.lit(1)).alias("n"), dsum("value", "total_value")],
    )
    t0 = time.time()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(f"probe31_{tag}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    prog = [json.loads(p.json) for p in q.recentProgress]
    print(f"--- {tag}: wall={wall:.3f}s batches={len(prog)}")
    for p in prog:
        dm = p.get("durationMs", {})
        print(
            "  batch", p.get("batchId"),
            "rows", p.get("numInputRows"),
            "durations", {k: dm.get(k) for k in sorted(dm)},
        )
    n = spark.sql(f"SELECT count(*) c FROM probe31_{tag}").first()["c"]
    print("  sink rows:", n)
spark.stop()
