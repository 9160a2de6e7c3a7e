"""Table maintenance: merge/upsert and CDC apply.

The reference's pipelines rebuild outputs from scratch each run
(Controller.hs RerunStrategy governs *whether* a stage reruns, not
*how much*); incremental maintenance of a big table against a small
batch of changes is left to the user. These operators provide the
delta-style MERGE patterns a 100 TB training-data store needs,
expressed as plain joins so Catalyst can pick the physical strategy.

Scale notes:
- `merge_upsert` is target ⟕anti updates ∪ updates. With a small
  update batch, the anti join BROADCASTS the batch — the 100 TB
  target is never shuffled, the whole merge is one narrow pass plus
  a union. (A full-outer-join formulation would shuffle the target
  on the key; avoid it.)
- `cdc_apply` first collapses the change log to the latest change
  per key (one shuffle of the SMALL change set), then applies the
  same anti-join+union plan.
- Both return a DataFrame; writing back is the caller's choice of
  sink (fan_out_write / Tap.write), typically partition-by so only
  touched partitions rewrite.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """MERGE: rows of `updates` replace same-key rows of `target`;
    unmatched update rows are inserted. Schemas must match."""
    upd = F.broadcast(updates) if broadcast_updates else updates
    kept = target.join(upd, list(keys), "left_anti")
    return kept.unionByName(updates)


def cdc_apply(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    seq_col: str = "seq",
    delete_op: str = "D",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply a change log (op ∈ {I,U,D}, monotone seq per key) to a
    snapshot: latest change per key wins; D deletes, I/U upsert.

    Ties on (key, seq) break on op descending so a delete-then-insert
    at the same seq resolves deterministically (insert wins: 'D' < 'I'
    < 'U' lexicographically, we take the max op)."""
    # latest change per key = max_by(row, (seq, op)) — struct
    # comparison is (seq, op) lexicographic, exactly the
    # seq-desc/op-desc row_number()==1 winner, but as an aggregate it
    # partial-aggregates map-side (each task ships one candidate per
    # key) and needs no per-partition sort (optimization r07)
    row = F.struct(*[F.col(c) for c in changes.columns])
    latest = (
        changes.groupBy(*[F.col(k) for k in keys])
        .agg(
            F.max_by(row, F.struct(F.col(seq_col), F.col(op_col))).alias("_r")
        )
        .select("_r.*")
    )
    ch = F.broadcast(latest) if broadcast_changes else latest
    kept = target.join(ch.select(*keys), list(keys), "left_anti")
    upserts = latest.filter(F.col(op_col) != delete_op).drop(op_col, seq_col)
    return kept.unionByName(upserts)


def scd2_close_out(
    history: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close current rows that have
    a newer version in `updates` (valid_to ← update ts, is_current ←
    false) and append the updates as new current rows.

    updates must carry `keys` + attribute columns + ts_col. One
    broadcast join against the (big) history; no history shuffle."""
    upd_ts = updates.select(
        *keys, F.col(ts_col).alias("_new_ts")
    )
    closed = (
        history.join(F.broadcast(upd_ts), list(keys), "left")
        .withColumn(
            valid_to,
            F.when(
                F.col(current_flag) & F.col("_new_ts").isNotNull(), F.col("_new_ts")
            ).otherwise(F.col(valid_to)),
        )
        .withColumn(
            current_flag,
            F.col(current_flag) & F.col("_new_ts").isNull(),
        )
        .drop("_new_ts")
    )
    fresh = (
        updates.withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, F.lit(None).cast(history.schema[valid_to].dataType))
        .withColumn(current_flag, F.lit(True))
        .drop(ts_col)
        .select(*history.columns)
    )
    return closed.unionByName(fresh)


def incremental_rollup(
    prev: DataFrame,
    batch_agg: DataFrame,
    keys: Sequence[str],
    merge_aggs: Sequence,
) -> DataFrame:
    """Continuous-aggregate maintenance (the hypertable-rollup
    pattern): merge an existing rollup with a new batch's partial
    rollup by re-aggregating their union on the same keys with the
    monoid's merge expressions (counts: sum of counts; sums: sum of
    partial sums — keep partials in DECIMAL so the merge is exact and
    associative, i.e. merged-incremental ≡ recomputed-from-scratch).

    Cost is O(|prev rollup| + |batch|): the raw history is never
    rescanned — the whole point at 100 TB, where the fact table is
    append-only and the rollup is small. Schemas of `prev` and
    `batch_agg` must match."""
    return prev.unionByName(batch_agg).groupBy(*keys).agg(*merge_aggs)


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Reconciliation diff of two same-schema tables: one row per key
    with status ∈ {only_left, only_right, changed, same}.

    Rows are reduced to (key, row_hash) BEFORE the full-outer join —
    the comparison columns never shuffle, only keys + one 32-byte
    hash, so diffing two 100 TB tables moves ~|keys|·40 bytes. The
    hash is md5 over null-tagged concatenation (null ≠ '' ≠ 'null'
    collisions avoided by a length prefix per field).
    """
    cols = compare_cols or [
        c for c in left.columns if c not in keys
    ]

    def hashed(df: DataFrame, alias: str) -> DataFrame:
        tagged = [
            F.concat_ws(
                ":",
                F.length(F.coalesce(F.col(c).cast("string"), F.lit(""))),
                F.coalesce(F.col(c).cast("string"), F.lit("\x00")),
            )
            for c in cols
        ]
        return df.select(
            *keys, F.md5(F.concat_ws("|", *tagged)).alias(alias)
        )

    l = hashed(left, "_lh")
    r = hashed(right, "_rh")
    j = l.join(r, on=keys, how="full_outer")
    status = (
        F.when(F.col("_rh").isNull(), F.lit("only_left"))
        .when(F.col("_lh").isNull(), F.lit("only_right"))
        .when(F.col("_lh") == F.col("_rh"), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, status.alias("status"))


def compaction_plan(
    files: DataFrame,
    size_col: str,
    target_bytes: int,
    part_cols: Sequence[str] = (),
    order_col: str | None = None,
) -> DataFrame:
    """Small-file compaction planner — the maintenance pass every
    long-lived 100 TB parquet store needs (streaming sinks, CDC
    appends, and fan-out writers all accrete KB-scale files that
    multiply task-scheduling and footer-read overhead).  Input is a
    file listing ((part_cols..., file id/order, size)) from
    `sources.fs.ls` or `ops.partition_stats`; output is one row per
    planned compaction bin.

    Deterministic NEXT-FIT by running size: within each partition,
    files in `order_col` order (must be UNIQUE per partition — a
    file path/id — or the running sum is tie-order-dependent) go to
    bin = floor(cum_before / target_bytes) — pure integer math
    (div), so the plan is hash-exact and identical on every
    engine/run, and a bin exceeds
    target_bytes by at most one file (the classic next-fit bound of
    2x optimal; the point of a compaction plan is merging tiny
    files, not optimal packing).  Files >= target_bytes land alone
    in their own bin span by the same rule — no special-casing, the
    rewrite of a big file is a no-op the executor can skip by
    checking n_files = 1.

    Plan: one per-partition cumulative window over the FILE LISTING
    (metadata-scale — millions of rows for a 100 TB store, never the
    data), one partial-agg'd groupBy onto the bins.  Returns
    (part_cols..., bin, n_files, total_bytes, files) with `files`
    the ordered file ids of the bin."""
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1: {target_bytes}")
    pc = list(part_cols)
    oc = order_col if order_col is not None else size_col
    w = (
        Window.partitionBy(*pc)
        .orderBy("_o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = (
        files.select(
            *pc,
            F.col(oc).alias("_o"),
            F.col(size_col).cast("long").alias("_sz"),
        )
        .withColumn("_cumb", F.sum("_sz").over(w) - F.col("_sz"))
        .withColumn("bin", F.expr(f"_cumb div {int(target_bytes)}"))
    )
    return (
        sized.groupBy(*pc, "bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("_sz").alias("total_bytes"),
            F.array_sort(F.collect_list(F.struct("_o", "_sz"))).alias("_fs"),
        )
        .select(
            *pc,
            "bin",
            "n_files",
            "total_bytes",
            F.transform("_fs", lambda s: s["_o"]).alias("files"),
        )
    )


def retention_plan(
    snapshots: DataFrame,
    ts_col: str,
    keep_last: int,
    cutoff: str | None = None,
    part_cols: Sequence[str] = (),
) -> DataFrame:
    """Snapshot retention planning — the expire-snapshots /
    expire-partitions decision every versioned 100 TB store makes
    on a schedule (Iceberg's expire_snapshots, Delta VACUUM): per
    partition KEEP the newest `keep_last` snapshots plus everything
    at-or-after `cutoff` (an explicit ISO timestamp — passing now()
    is the caller's choice; an implicit clock would make the plan
    unreproducible), EXPIRE the rest.

    One rank window over the METADATA-scale snapshot listing,
    integer/timestamp comparisons only — the plan is hash-exact and
    auditable before a single file is touched (emit → review →
    execute, the compaction_plan discipline).  Ties on ts within a
    partition rank deterministically by ts then remaining columns'
    natural arrival — pass a unique snapshot id as the LAST
    part_col-free column ordering concern; in practice snapshot
    timestamps are unique per table.  Returns the input columns
    plus (rank_desc, action) where action ∈ keep|expire."""
    if keep_last < 0:
        raise ValueError(f"keep_last must be >= 0: {keep_last}")
    pc = list(part_cols)
    w = Window.partitionBy(*pc).orderBy(F.col(ts_col).desc())
    ranked = snapshots.withColumn("rank_desc", F.row_number().over(w))
    keep = F.col("rank_desc") <= keep_last
    if cutoff is not None:
        keep = keep | (F.col(ts_col) >= F.to_timestamp(F.lit(cutoff)))
    return ranked.withColumn(
        "action", F.when(keep, F.lit("keep")).otherwise(F.lit("expire"))
    )


def compaction_execute(
    spark,
    plan: DataFrame,
    fmt: str = "parquet",
    keep_originals: bool = False,
) -> DataFrame:
    """Execute a `compaction_plan`: rewrite every multi-file bin as
    ONE file and (by default) delete the originals — the EXECUTE leg
    of the tier's emit → review → execute contract (the plan frame is
    the reviewable artifact; nothing is touched until this call).

    Mechanics per bin (driver loop over the METADATA-scale plan —
    bins, not rows; each bin's rewrite is a distributed job):
      read bin files → coalesce(1) → write `<first>.compact._tmp` →
      delete originals → rename tmp's part file to `<first>.compact`.
    Single-file bins are SKIPPED (a rewrite would be a no-op — the
    next-fit rule parks oversized files alone in their own bin
    precisely so the executor can skip them).  Crash windows: a
    leftover `._tmp` dir with originals present is garbage (re-run
    re-plans and overwrites it); originals deleted + tmp present is
    healed by the rename-on-entry sweep.  `keep_originals=True` turns
    the executor into a dry-run-with-artifacts mode (compacted files
    written next to the originals).

    The plan's `files` entries must be absolute paths (the
    `sources.fs.ls` output `compaction_plan` documents as its input).
    Returns (part keys..., bin, n_files, bytes_in, action) — one row
    per bin, action ∈ compacted|skipped."""
    from hadron_spark.sources import fs

    pc = [c for c in plan.columns if c not in
          ("bin", "n_files", "total_bytes", "files")]
    rows = plan.collect()  # metadata-scale by contract
    out = []
    for r in rows:
        paths = list(r["files"])
        if len(paths) <= 1:
            out.append((*[r[c] for c in pc], r["bin"], len(paths),
                        int(r["total_bytes"]), "skipped"))
            continue
        target = paths[0] + ".compact"
        tmp = target + "._tmp"
        # heal: a prior crash after originals were deleted left tmp
        if fs.exists(spark, tmp) and not fs.exists(spark, paths[0]):
            _promote_compact(spark, fs, tmp, target)
            out.append((*[r[c] for c in pc], r["bin"], len(paths),
                        int(r["total_bytes"]), "compacted"))
            continue
        spark.read.format(fmt).load(paths).coalesce(1).write.format(
            fmt
        ).mode("overwrite").save(tmp)
        if not keep_originals:
            # paths[0] LAST: the heal predicate above is `tmp exists AND
            # paths[0] missing`, so it must only become true once EVERY
            # original is gone.  Deleting in list order would open a crash
            # window (paths[0] gone, paths[1:] present) where the next run
            # promotes the compact file while leftovers silently duplicate
            # their rows in the store.
            for p in paths[1:]:
                fs.delete(spark, p)
            fs.delete(spark, paths[0])
        _promote_compact(spark, fs, tmp, target)
        out.append((*[r[c] for c in pc], r["bin"], len(paths),
                    int(r["total_bytes"]), "compacted"))
    schema_pc = ", ".join(f"`{c}` string" for c in pc)
    schema = (schema_pc + ", " if schema_pc else "") + (
        "bin long, n_files long, bytes_in long, action string"
    )
    return spark.createDataFrame(
        [tuple(str(x) if i < len(pc) else x for i, x in enumerate(row))
         for row in out],
        schema,
    )


def _promote_compact(spark, fs, tmp: str, target: str) -> None:
    """Move the single part file out of a `._tmp` write dir to the
    final `<target>` path and drop the dir."""
    part = [
        e.path for e in fs.ls(spark, tmp)
        if not e.is_dir and e.path.rsplit("/", 1)[1].startswith("part-")
    ]
    if len(part) != 1:
        raise RuntimeError(f"expected one part file in {tmp}: {part}")
    if fs.exists(spark, target):
        fs.delete(spark, target)
    fs.mv(spark, part[0], target)
    fs.delete(spark, tmp)
