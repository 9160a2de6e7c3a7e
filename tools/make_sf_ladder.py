"""Build a replicated SF rung for SCALING measurement (VERDICT r07 #7).

At sf0.1 the bench is overhead-bound: the 8-core total is within 3% of
the 32-core total, so core-scaling ratios measure JVM/job fixed costs,
not data parallelism.  This tool builds an N-times-larger rung by
turning each single-file table into a directory of N symlinks to the
same parquet file — Spark unions the copies, so every scan sees N x
the rows (duplicate keys and all, which is fine for MEASUREMENT: the
rung is never used for correctness, only to compare 8-core vs 32-core
wall time of the same query at a size where parallelism matters).

Usage: python tools/make_sf_ladder.py [src_sf_dir] [factor] [dest]
       defaults: /root/testdata/sf0.1  5  /tmp/sf_ladder_x{factor}

Then:  SPARK_GRAFT_SF_DIR=<dest> SPARK_GRAFT_CPUS={8,32} python bench.py
(or a single-query probe) — record the ratio in BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import sys


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    dest = (
        sys.argv[3]
        if len(sys.argv) > 3
        else f"/tmp/sf_ladder_x{factor}"
    )
    if os.path.exists(dest):
        shutil.rmtree(dest)
    os.makedirs(dest)
    for name in sorted(os.listdir(src)):
        if not name.endswith(".parquet"):
            continue
        table_dir = os.path.join(dest, name)
        os.makedirs(table_dir)
        for i in range(factor):
            os.symlink(
                os.path.join(src, name),
                os.path.join(table_dir, f"part-{i:05d}.parquet"),
            )
    print(f"built {dest}: {factor}x {src}")


if __name__ == "__main__":
    main()
