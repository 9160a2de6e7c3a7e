"""Layout pruning shoot-out — WHY `zorder_write`/`hilbert_write`
exist, measured: write the same table three ways (insertion order,
Z-order, Hilbert), then for a batch of random 2-D box predicates
count how many FILES a min/max-stats-aware reader must open under
each layout (the row-group pruning parquet readers do from footer
stats — computed here directly from the footers via pyarrow, so the
number is the layout's, not the scheduler's).

Expected shape: insertion order prunes nothing (every file spans the
whole key space), Morton prunes most files, Hilbert prunes at least
as well (its walk never jumps, so equal-size d-ranges have tighter
x/y bounding boxes — the quadrant-seam jumps are exactly where
Z-order's boxes bloat).

Run: python examples/layout_pruning.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.sources.layout import hilbert_write, zorder_write


def file_ranges(path: str, xcol: str, ycol: str):
    """(min, max) of both dims per parquet file, from footer stats."""
    out = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        lo = [None, None]
        hi = [None, None]
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in range(g.num_columns):
                col = g.column(c)
                name = col.path_in_schema
                if name not in (xcol, ycol):
                    continue
                i = 0 if name == xcol else 1
                st = col.statistics
                lo[i] = st.min if lo[i] is None else min(lo[i], st.min)
                hi[i] = st.max if hi[i] is None else max(hi[i], st.max)
        out.append((lo[0], hi[0], lo[1], hi[1]))
    return out


def files_touched(ranges, box):
    x1, x2, y1, y2 = box
    return sum(
        1
        for lx, hx, ly, hy in ranges
        if not (hx < x1 or lx > x2 or hy < y1 or ly > y2)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("layout_pruning_example")
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="layout_")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        (F.col("o_custkey") % 1024).alias("x"),
        (F.round(F.col("o_totalprice") / 600).cast("long") % 1024).alias("y"),
    )
    n_files = 16
    plain = f"{work}/plain"
    o.repartition(n_files).write.parquet(plain)  # insertion/hash order
    zdir = f"{work}/zorder"
    zorder_write(o, zdir, ["x", "y"], bits=10, num_files=n_files)
    hdir = f"{work}/hilbert"
    hilbert_write(o, hdir, "x", "y", bits=10, num_files=n_files)

    layouts = {
        "insertion": file_ranges(plain, "x", "y"),
        "zorder": file_ranges(zdir, "x", "y"),
        "hilbert": file_ranges(hdir, "x", "y"),
    }
    # deterministic batch of 64 box queries (1/8th of each axis)
    boxes = []
    for i in range(64):
        x = (i * 193) % 896
        y = (i * 389) % 896
        boxes.append((x, x + 128, y, y + 128))

    print(f"files per layout: {n_files}; 64 random 128x128 box queries")
    print("| layout | avg files touched | worst | best |")
    print("|---|---|---|---|")
    results = {}
    for name, ranges in layouts.items():
        touched = [files_touched(ranges, b) for b in boxes]
        results[name] = sum(touched) / len(touched)
        print(
            f"| {name} | {results[name]:.2f} | {max(touched)} | {min(touched)} |"
        )
    assert results["hilbert"] <= results["zorder"] <= results["insertion"], results
    print("pruning order holds: hilbert <= zorder <= insertion")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
