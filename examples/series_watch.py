"""Metric-series watch — the time-series kit composed the way an
on-call actually reads a drifting metric, every batch number
hash-exact (bounded-cell / exact-integer discipline) and the live
leg exactly-once:

1. `mann_kendall`     — is the daily series drifting at all?
                        (full two-axis tie-corrected z)
2. `theil_sen_slope`  — how fast? (robust to outlier days)
3. `cusum_changepoint`— WHEN did the level shift? (all-integer
                        argmax of |n·P_i − i·T|)
4. `runs_test` + `durbin_watson` — are the deviations serially
                        clean, or do the variance formulas above
                        need a grain of salt?
5. `holt_winters`     — trend+seasonal smooth of the series;
6. `forecast_accuracy`— does weekly seasonal-naive beat naive-1?
                        (MASE < 1 = yes)
7. `incremental_cusum`— keep watching LIVE: the tabular CUSUM
                        control chart as a foreachBatch state op,
                        chop-equivalent to the batch walk.

Run: python examples/series_watch.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.operators.ops import (
    cusum_changepoint,
    durbin_watson,
    forecast_accuracy,
    holt_winters,
)
from hadron_spark.operators.robust import (
    mann_kendall,
    runs_test,
    theil_sen_slope,
)
from hadron_spark.sources.taps import Tap
from hadron_spark.streaming.ops import cusum_apply_fn, read_cusum_state


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("series_watch_example")

    ev = (
        Tap([f"{sf_dir}/events.parquet"], "parquet")
        .read(spark)
        .filter(F.col("value").isNotNull())
    )
    if dict(ev.dtypes)["ts"] == "bigint":  # parquet TIMESTAMP(NANOS)
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))

    print("== 1. Mann-Kendall: is daily revenue drifting? ==")
    mk = mann_kendall(daily, "day", "cents", ["event_type"])
    mk.orderBy("event_type").show(5, truncate=False)

    print("== 2. Theil-Sen: how fast (cents/day, outlier-robust)? ==")
    theil_sen_slope(daily, "day", "cents", ["event_type"]).orderBy(
        "event_type"
    ).show(5, truncate=False)

    print("== 3. CUSUM: when did the level shift? ==")
    cusum_changepoint(daily, "day", "cents", ["event_type"]).orderBy(
        "event_type"
    ).show(5, truncate=False)

    print("== 4. Residual hygiene: runs test + Durbin-Watson ==")
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nn"), F.sum("cents").alias("t")
    )
    resid = daily.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "day",
        (F.col("nn") * F.col("cents") - F.col("t")).alias("e"),
    )
    runs_test(resid, "day", "e", ["event_type"]).orderBy(
        "event_type"
    ).show(5, truncate=False)
    durbin_watson(resid, "day", "e", ["event_type"]).orderBy(
        "event_type"
    ).show(5, truncate=False)

    print("== 5. Holt-Winters smooth (weekly season, tail rows) ==")
    hw = holt_winters(
        daily.withColumn("y", F.col("cents").cast("double")),
        "day",
        "y",
        period=7,
        alpha=0.25,
        beta=0.125,
        gamma=0.25,
        partition_cols=["event_type"],
    )
    hw.orderBy(F.col("event_type"), F.col("day").desc()).show(
        5, truncate=False
    )

    print("== 6. Forecast accuracy: seasonal-naive (lag 7) vs naive-1 ==")
    w = Window.partitionBy("event_type").orderBy("day")
    fc = daily.withColumn("f", F.lag("cents", 7).over(w)).filter(
        F.col("f").isNotNull()
    )
    forecast_accuracy(fc, "day", "cents", "f", ["event_type"]).orderBy(
        "event_type"
    ).show(5, truncate=False)

    print("== 7. Live leg: tabular CUSUM control chart, 3 chops ==")
    work = tempfile.mkdtemp(prefix="series_watch_")
    try:
        lo, hi = daily.agg(F.min("day"), F.max("day")).collect()[0]
        cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
        # control-chart center = the first week's mean daily total
        # (the in-control period a chart is always tuned against)
        target = float(
            daily.filter(F.col("day") < lo + 7)
            .agg(F.avg("cents"))
            .collect()[0][0]
        )
        apply = cusum_apply_fn(
            f"{work}/state", "event_type", "day", "cents",
            target=target, slack=target * 0.05, threshold=target * 1.5,
        )
        apply(daily.filter(F.col("day") <= cut1), 0)
        apply(
            daily.filter((F.col("day") > cut1) & (F.col("day") <= cut2)),
            1,
        )
        apply(daily.filter(F.col("day") > cut2), 2)
        read_cusum_state(spark, f"{work}/state").orderBy("key").show(
            5, truncate=False
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print("series_watch: all 7 stages completed")
    spark.stop()


if __name__ == "__main__":
    main()
