"""SCALE rung for the bucketed streaming near-dup signature store:
probe wall-clock as the admitted store grows 64x.

Builds a compacted pre-banded base of N synthetic signatures at rungs
N, 8N, 64N and times ONE fixed micro-batch probe (64 docs) against
each, in both shapes:
  old  — the r5 path: re-band the whole unbanded store + window
         bucket guard + shuffled equi-join (store side exchanges
         every batch);
  new  — `_neardup_probe`: partition-pruned scan of the bucketed
         base + bkey pushdown + broadcast batch side (store never
         shuffles).

Usage: python tools/scale_probe_neardup.py [base_n] [factor ...]
Appends one JSON line per rung to stdout; paste results into SCALE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

NUM_HASHES = 16
BANDS = 4
BUCKETS = 64
BATCH = 64


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


def build_state(spark, root: str, n: int) -> str:
    from hadron_spark.streaming.ops import (
        _neardup_marker_df,
        compact_neardup_state,
    )

    state = f"{root}/state_{n}"
    synth_sigs(spark, n, seed=0).write.mode("overwrite").parquet(
        state + "/sigs/batch=0"
    )
    # kept side only needs to exist for the fold
    spark.range(1).select(F.lit(0).alias("doc_id")).write.mode(
        "overwrite"
    ).parquet(state + "/kept/batch=0")
    _neardup_marker_df(spark, 0, -1, NUM_HASHES, BANDS, BUCKETS).write.mode(
        "overwrite"
    ).parquet(state + "/hwm_marker")
    compact_neardup_state(spark, state)
    return state


def probe_new(spark, state: str, nb_sigs) -> float:
    from hadron_spark.streaming.ops import _neardup_probe

    t0 = time.time()
    dup = _neardup_probe(
        spark, state, nb_sigs, 0, 0, threshold=0.8, num_hashes=NUM_HASHES,
        bands=BANDS, max_bucket_size=500, store_buckets=BUCKETS,
        probe_key_limit=65536,
    )
    n = dup.count()
    return time.time() - t0, n


def probe_old(spark, state: str, nb_sigs) -> float:
    """The r5 shape: unbanded store -> band -> window guard ->
    shuffled equi-join (reconstruct the unbanded view from the banded
    base by taking band 0's rows)."""
    from hadron_spark.llm.dedup import (
        _drop_oversized_buckets,
        band_signatures,
    )

    t0 = time.time()
    store = (
        spark.read.parquet(state + "/sigs_base=0")
        .filter(F.col("band") == 0)
        .select("_id", "sig")
    )
    nb = band_signatures(nb_sigs, NUM_HASHES, BANDS)
    cb = band_signatures(store, NUM_HASHES, BANDS)
    cb = _drop_oversized_buckets(cb, ["band", "bkey"], 500)
    est = (
        F.expr(
            "size(filter(zip_with(n.sig, c.sig, (x, y) -> x = y), m -> m))"
        ).cast("double")
        / F.lit(NUM_HASHES)
    )
    n = (
        nb.alias("n")
        .join(cb.alias("c"), on=["band", "bkey"])
        .select(F.col("n._id").alias("_id"), est.alias("_est"))
        .filter(F.col("_est") >= 0.8)
        .select("_id")
        .distinct()
        .count()
    )
    return time.time() - t0, n


def main() -> int:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    factors = [int(x) for x in sys.argv[2:]] or [1, 8, 64]

    from hadron_spark import get_spark

    spark = get_spark(
        "scale_probe_neardup",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    root = tempfile.mkdtemp(prefix="ndscale_")
    # fixed probe batch: half colliding with store ids, half fresh
    nb_sigs = synth_sigs(spark, BATCH // 2, seed=0).unionByName(
        synth_sigs(spark, BATCH // 2, seed=7)
    ).localCheckpoint(eager=True)
    try:
        for f in factors:
            n = base_n * f
            state = build_state(spark, root, n)
            # warm-up once, then time
            probe_new(spark, state, nb_sigs)
            tn, dn = probe_new(spark, state, nb_sigs)
            to, do = probe_old(spark, state, nb_sigs)
            print(json.dumps({
                "store_rows": n, "factor": f,
                "probe_new_sec": round(tn, 3), "dup_new": dn,
                "probe_old_sec": round(to, 3), "dup_old": do,
            }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
