"""Count-min sketch: mergeable frequency sketch as a distributed
operator (the reference's monoid-aggregation idiom applied to a
sub-linear summary; complements the built-in HLL/quantile sketches
q72 uses).

Shape: one Arrow-batched pass builds a per-partition (depth × width)
integer sketch plus a local candidate list (mapInPandas — partition
sketches are tiny, ~depth·width longs); the partials merge by SLOT
with an ordinary groupBy-sum (partial agg applies — the merge is the
monoid sum of sketches); estimates come from a broadcast join of the
candidates' probe slots against the merged sketch. Nothing returns to
the driver; the sketch itself is a DataFrame.

Hash family: row i probes slot md5(key ":" i) — computed with
hashlib in the build pass and the IDENTICAL md5 expression in the
probe query, so build and probe always agree (and both engines would,
for an oracle on collision-free keys).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _slot(key: str, row: int, width: int) -> int:
    h = hashlib.md5(f"{key}:{row}".encode()).hexdigest()[:15]
    return int(h, 16) % width


def _slot_expr(key_col, row: int, width: int):
    # first 15 hex chars < 2^60: conv() to decimal stays exact in a long
    h = F.conv(
        F.substring(F.md5(F.concat(key_col, F.lit(f":{row}"))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % width


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    candidates_per_partition: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Build the merged sketch. Returns (sketch, candidates):
    sketch = (slot, cnt) with slot = row * width + probe column —
    at most depth·width rows regardless of input size; candidates =
    distinct keys that were a local top-`candidates_per_partition`
    frequency in ≥1 partition (every global heavy hitter is a local
    one in some partition by pigeonhole)."""
    d, w = depth, width

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        counts: Counter = Counter()
        for pdf in batches:
            counts.update(pdf[key_col].dropna().astype(str))
        slots: Counter = Counter()
        for k, n in counts.items():
            for i in range(d):
                slots[i * w + _slot(k, i, w)] += n
        cand = [k for k, _ in counts.most_common(candidates_per_partition)]
        yield pd.DataFrame(
            {
                "slot": list(slots.keys()) + [-1] * len(cand),
                "cnt": list(slots.values()) + [0] * len(cand),
                "key": [None] * len(slots) + cand,
            }
        )

    parts = df.select(key_col).mapInPandas(
        build, "slot long, cnt long, key string"
    )
    sketch = (
        parts.filter(F.col("slot") >= 0)
        .groupBy("slot")
        .agg(F.sum("cnt").alias("cnt"))
    )
    candidates = (
        parts.filter(F.col("slot") == -1).select("key").distinct()
    )
    return sketch, candidates


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(key, est) for every candidate whose count-min estimate ≥
    threshold. est = min over the depth probe rows (classic CMS upper
    bound: est ≥ true count, with equality when the key's slots are
    collision-free — guaranteed-ish for small key domains vs width).
    The merged sketch is ≤ depth·width rows → broadcast side of the
    probe join."""
    sketch, candidates = count_min_sketch(df, key_col, depth, width)
    probes = candidates.select(
        F.col("key"),
        F.explode(
            F.array(
                *[
                    (F.lit(i * width) + _slot_expr(F.col("key"), i, width))
                    for i in range(depth)
                ]
            )
        ).alias("slot"),
    )
    return (
        probes.join(F.broadcast(sketch), "slot")
        .groupBy("key")
        .agg(F.min("cnt").alias("est"))
        .filter(F.col("est") >= threshold)
    )


# ---------------------------------------------------------------------------
# HLL sketch rollup — incremental distinct-count maintenance
# ---------------------------------------------------------------------------


def hll_rollup(
    df: DataFrame,
    key_cols,
    col: str,
    lg_k: int = 12,
    sketch_col: str = "hll",
) -> DataFrame:
    """Per-key HyperLogLog sketches (Apache DataSketches HllSketch,
    Spark's hll_sketch_agg): one partial-aggregated shuffle produces
    a ~2^lg_k-byte binary sketch per key, the PERSISTED form of a
    distinct count. Because HLL union is lossless (register-wise
    max), yesterday's per-day sketches never need recomputing: any
    rollup (day→month→all-time) is `hll_union` over stored sketches
    — the continuous-aggregate pattern that makes "distinct users
    ever" an O(sketch) nightly merge at 100 TB instead of an
    O(data) rescan."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias(sketch_col)
    )


def hll_merge(
    df: DataFrame, group_cols, sketch_col: str = "hll"
) -> DataFrame:
    """Merge stored sketches up a hierarchy (register-wise max —
    associative, commutative, idempotent: re-merging overlapping
    spans never double-counts)."""
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    agg = F.hll_union_agg(sketch_col).alias(sketch_col)
    return df.groupBy(*keys).agg(agg) if keys else df.agg(agg)


def hll_estimate(df: DataFrame, sketch_col: str = "hll", out: str = "est"):
    """Read a stored sketch back as a distinct-count estimate."""
    return df.withColumn(out, F.hll_sketch_estimate(sketch_col))


def frequent_items_exact(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """EXACT frequent items (count ≥ threshold) with a CMS pre-pass:
    the merged sketch screens every distinct key (est = min over
    probe rows, est ≥ true count — CMS never under-counts, so no
    true heavy hitter can be screened out), and only the surviving
    candidates get an exact re-count. Result is bit-identical to the
    naive GROUP BY … HAVING — the sketch is pure optimization,
    invisible in the output (q136's oracle is that naive form, the
    same invisibility contract as q102's salting and q129's bloom).

    Scale shape: sketch = a codegen'd explode of depth probe slots
    per row, partial-aggregated to ≤ depth·width rows (never leaves
    the JVM); screening probes |distinct keys| rows against the
    broadcast sketch; the exact pass re-aggregates ONLY candidate
    rows (a broadcast semi-join prunes the rest at the scan). At
    100 TB with a selective threshold the candidate set is orders of
    magnitude smaller than the key domain, so the expensive exact
    shuffle carries a sliver of the data."""
    # The sketch here is pure codegen'd SQL (explode d probe slots per
    # row → partial-agg'd count per slot), NOT count_min_sketch's
    # Python pass — that pass exists to gather per-partition candidate
    # lists, which this exact path never uses. Probe hashing is native
    # xxhash64: the screen is invisible in results (the exact re-count
    # decides), so it needs only within-engine determinism — same
    # reasoning as joins.bloom_prefilter_join.
    def probe_slots(key_col_expr):
        return F.explode(
            F.array(
                *[
                    F.lit(i * width)
                    + F.pmod(F.xxhash64(key_col_expr, F.lit(i)), F.lit(width))
                    for i in range(depth)
                ]
            )
        ).alias("slot")

    sketch = (
        df.select(probe_slots(F.col(key_col)))
        .groupBy("slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    keys = df.select(key_col).distinct()
    cand = (
        keys.select(key_col, probe_slots(F.col(key_col)))
        .join(F.broadcast(sketch), "slot")
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
        .filter(F.col("est") >= threshold)
        .select(key_col)
    )
    # null-safe semi join: a plain `[key_col]` semi join never matches
    # NULL keys, so a NULL group meeting the threshold would vanish
    # while the naive GROUP BY ... HAVING oracle keeps it (ADVICE r1)
    return (
        df.join(
            F.broadcast(cand.withColumnRenamed(key_col, "_cand_k")),
            F.col(key_col).eqNullSafe(F.col("_cand_k")),
            "left_semi",
        )
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )
