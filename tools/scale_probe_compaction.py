"""SCALE rung for incremental near-dup state compaction (VERDICT r6
#2): fold wall-clock for a FIXED delta as the committed base grows 64x.

Builds a compacted base segment of N synthetic signatures at rungs
N, 8N, 64N, appends one fixed 5k-row delta batch, and times
`compact_neardup_state` in both modes:
  full        — the r6 path: re-read base + delta, window the bucket
                counts over EVERYTHING, rewrite the whole store
                (one full-store pass per fold);
  incremental — the r7 path: read ONLY the delta batches, write them
                as one new immutable segment (committed segments are
                never re-read).

Expected shape: full grows with the base; incremental stays flat at
the delta's own cost.

Usage: python tools/scale_probe_compaction.py [base_n] [factor ...]
Appends one JSON line per rung to stdout; paste results into SCALE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

NUM_HASHES = 16
BANDS = 4
BUCKETS = 64
DELTA = 5_000


def synth_sigs(spark, n: int, seed: int):
    """(_id, sig) with deterministic pseudo-random 16-long signatures
    — same shape minhash_signature emits, no shingling cost."""
    return spark.range(n).select(
        (F.col("id") + seed * 1_000_000_000).alias("_id"),
        F.array(
            *[
                F.xxhash64(F.col("id") + seed * 1_000_000_000, F.lit(i))
                for i in range(NUM_HASHES)
            ]
        ).alias("sig"),
    )


def build_state(spark, root: str, n: int, tag: str) -> str:
    """Base segment of n rows (committed), plus one DELTA-row batch
    above it — the state every timed fold starts from."""
    from hadron_spark.streaming.ops import (
        _neardup_marker_df,
        compact_neardup_state,
    )

    state = f"{root}/state_{tag}_{n}"
    synth_sigs(spark, n, seed=0).write.mode("overwrite").parquet(
        state + "/sigs/batch=0"
    )
    spark.range(1).select(F.lit(0).alias("doc_id")).write.mode(
        "overwrite"
    ).parquet(state + "/kept/batch=0")
    _neardup_marker_df(spark, 0, -1, NUM_HASHES, BANDS, BUCKETS).write.mode(
        "overwrite"
    ).parquet(state + "/hwm_marker")
    compact_neardup_state(spark, state)  # base segment at v=0
    synth_sigs(spark, DELTA, seed=3).write.mode("overwrite").parquet(
        state + "/sigs/batch=1"
    )
    spark.range(1).select(F.lit(1).alias("doc_id")).write.mode(
        "overwrite"
    ).parquet(state + "/kept/batch=1")
    _neardup_marker_df(
        spark, 1, 0, NUM_HASHES, BANDS, BUCKETS, segs=[0]
    ).write.mode("overwrite").parquet(state + "/hwm_marker")
    return state


def main() -> int:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    factors = [int(x) for x in sys.argv[2:]] or [1, 8, 64]

    from hadron_spark import get_spark
    from hadron_spark.streaming.ops import compact_neardup_state

    spark = get_spark(
        "scale_probe_compaction",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    root = tempfile.mkdtemp(prefix="ndcompact_")
    try:
        for f in factors:
            n = base_n * f
            row = {"store_rows": n, "factor": f, "delta_rows": DELTA}
            for mode in ("incremental", "full"):
                state = build_state(spark, root, n, mode)
                t0 = time.time()
                folded = compact_neardup_state(spark, state, mode=mode)
                row[f"fold_{mode}_sec"] = round(time.time() - t0, 3)
                assert folded == 1, folded
                shutil.rmtree(state, ignore_errors=True)
            print(json.dumps(row))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
