"""map/reduce surface (SURVEY §2.3-2.4: M1-M7, A1-A3) including the
constant-space streaming reducer and error strategies."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hadron_spark.operators.mapreduce import (
    RETHROW,
    SKIP_KEY,
    map_step,
    monoid_reduce,
    reduce_step,
    reduce_stream_sorted,
)
from hadron_spark.sources.taps import tap


def test_map_step_flatmap(spark, sf_dir):
    docs = tap(f"{sf_dir}/documents.parquet").read(spark).limit(10)

    def explode_words(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = [
            {"doc_id": d, "word": w}
            for d, t in zip(pdf["doc_id"], pdf["text"])
            for w in t.split()
        ]
        return pd.DataFrame(rows, columns=["doc_id", "word"])

    out = map_step(docs, explode_words, "doc_id bigint, word string")
    n_words = out.count()
    expected = docs.select(F.sum(F.size(F.split("text", r"\s+"))).alias("n")).collect()[0]["n"]
    assert n_words == expected


def test_reduce_step_per_key(spark, sf_dir):
    orders = tap(f"{sf_dir}/orders.parquet").read(spark)

    def span(pdf: pd.DataFrame) -> pd.DataFrame:
        # sorted by o_orderdate per the sort_within contract
        assert list(pdf["o_orderdate"]) == sorted(pdf["o_orderdate"])
        return pd.DataFrame(
            {
                "o_custkey": [pdf["o_custkey"].iloc[0]],
                "n": [len(pdf)],
                "first_price": [pdf["o_totalprice"].iloc[0]],
            }
        )

    out = reduce_step(
        orders,
        ["o_custkey"],
        span,
        "o_custkey bigint, n bigint, first_price double",
        sort_within=["o_orderdate"],
    )
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == orders.count()


def test_reduce_step_skip_key(spark, sf_dir):
    orders = tap(f"{sf_dir}/orders.parquet").read(spark)

    def explode_on_small_keys(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["o_custkey"].iloc[0] < 10:
            raise ValueError("boom")
        return pd.DataFrame({"o_custkey": [pdf["o_custkey"].iloc[0]]})

    ok = reduce_step(
        orders, ["o_custkey"], explode_on_small_keys, "o_custkey bigint",
        on_error=SKIP_KEY,
    )
    keys = [r[0] for r in ok.collect()]
    assert keys and all(k >= 10 for k in keys)

    bad = reduce_step(
        orders, ["o_custkey"], explode_on_small_keys, "o_custkey bigint",
        on_error=RETHROW,
    )
    with pytest.raises(Exception):
        bad.collect()


def test_reduce_stream_sorted_matches_groupby(spark, sf_dir):
    """Streaming reducer (A2 sameKey splitter) == plain groupBy agg."""
    li = tap(f"{sf_dir}/lineitem.parquet").read(spark).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )

    def fold(key, chunks):
        n = 0
        qty = 0.0
        last_ln = None
        for pdf in chunks:
            # secondary-sort contract: linenumbers arrive ordered
            for ln in pdf["l_linenumber"]:
                assert last_ln is None or ln >= last_ln
                last_ln = ln
            n += len(pdf)
            qty += float(pdf["l_quantity"].sum())
        yield pd.DataFrame(
            {"l_orderkey": [key[0]], "n": [n], "total_qty": [qty]}
        )

    out = reduce_stream_sorted(
        li, ["l_orderkey"], ["l_linenumber"], fold,
        "l_orderkey bigint, n bigint, total_qty double",
    ).collect()
    expect = {
        r["l_orderkey"]: (r["n"], r["q"])
        for r in li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
        .collect()
    }
    assert len(out) == len(expect)
    for r in out:
        n, q = expect[r["l_orderkey"]]
        assert r["n"] == n and abs(r["total_qty"] - q) < 1e-6


def test_monoid_reduce_partial_agg_plan(spark, sf_dir):
    """Combiner semantics (A3): the physical plan must contain partial
    aggregation before the exchange (HashAggregate → Exchange →
    HashAggregate)."""
    li = tap(f"{sf_dir}/lineitem.parquet").read(spark)
    out = monoid_reduce(li, ["l_returnflag"], [F.sum("l_quantity").alias("q")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_map_step_arrow(spark):
    import pyarrow as pa

    from hadron_spark.operators.mapreduce import map_step_arrow

    df = spark.createDataFrame([(1, b"ab"), (2, b"cdef")], "id long, payload binary")

    def add_len(batches):
        for b in batches:
            ids = b.column("id")
            lens = pa.compute.binary_length(b.column("payload"))
            yield pa.RecordBatch.from_arrays([ids, lens], ["id", "n_bytes"])

    out = {r["id"]: r["n_bytes"] for r in map_step_arrow(df, add_len, "id long, n_bytes int").collect()}
    assert out == {1: 2, 2: 4}


def test_stream_sorted_groups_constant_space():
    """The sameKey splitter's memory contract (VERDICT r1 #2): at
    most the chunk `fn` is processing plus a one-chunk lookahead may
    have been pulled from the source — a single key spanning many
    Arrow batches must NOT be buffered into a list before `fn` runs."""
    import pandas as pd

    from hadron_spark.operators.mapreduce import _stream_sorted_groups

    pulled = {"n": 0}

    def batches():
        # one giant key "a" across 8 batches, then "b" across 2
        for i in range(8):
            pulled["n"] += 1
            yield pd.DataFrame({"k": ["a"] * 3, "v": [i] * 3})
        for i in range(2):
            pulled["n"] += 1
            yield pd.DataFrame({"k": ["b"] * 2, "v": [i] * 2})

    seen = []

    def fn(key, chunks):
        consumed = 0
        total = 0
        start = pulled["n"]  # batches already pulled before this group
        for c in chunks:
            consumed += 1
            total += int(c["v"].sum())
            # lookahead bound: source pulls never run ahead of this
            # group's consumption by more than 1 batch
            assert pulled["n"] - start <= consumed + 1, (
                f"buffered: pulled {pulled['n'] - start} batches into "
                f"this group but fn has only consumed {consumed}"
            )
        seen.append((key, consumed, total))
        yield pd.DataFrame({"k": [key[0]], "total": [total]})

    out = list(_stream_sorted_groups(batches(), ["k"], fn))
    assert [s[0] for s in seen] == [("a",), ("b",)]
    assert seen[0][1] == 8 and seen[1][1] == 2  # all chunks streamed
    assert seen[0][2] == 3 * sum(range(8))
    assert len(out) == 2

    # the b-group assertion sees pulls offset by a's 8 batches — rerun
    # with a fresh counter per group to pin the bound tightly for b too
    pulled["n"] = 0

    def batches_b():
        for i in range(5):
            pulled["n"] += 1
            yield pd.DataFrame({"k": ["x"] * 2, "v": [i] * 2})

    def fn_partial(key, chunks):
        next(chunks)  # consume only the first chunk, then return
        yield pd.DataFrame({"k": [key[0]], "total": [0]})

    out2 = list(_stream_sorted_groups(batches_b(), ["k"], fn_partial))
    assert len(out2) == 1  # remainder drained, no crash, no dup group


def test_coalesce_frames_order_and_bounds():
    """Optimization r07: reduce_stream_sorted merges per-key output
    frames into ~target_rows Arrow batches.  Rows and order must be
    IDENTICAL to the unmerged stream; memory stays bounded (an
    at/above-target frame passes through untouched); the tail is
    flushed."""
    import pandas as pd

    from hadron_spark.operators.mapreduce import _coalesce_frames

    # 1000 single-row frames -> few frames, identical concatenation
    frames = [pd.DataFrame({"k": [i], "v": [i * 2]}) for i in range(1000)]
    out = list(_coalesce_frames(iter(frames), target_rows=256))
    assert len(out) == 4  # ceil(1000/256) with exact-boundary flushes
    merged = pd.concat(out, ignore_index=True)
    expect = pd.concat(frames, ignore_index=True)
    assert merged.equals(expect)

    # a big frame flushes promptly (never re-buffered past the
    # target), interleaved order preserved around it
    big = pd.DataFrame({"k": range(500), "v": range(500)})
    mix = [pd.DataFrame({"k": [-1], "v": [-1]}), big,
           pd.DataFrame({"k": [-2], "v": [-2]})]
    out2 = list(_coalesce_frames(iter(mix), target_rows=256))
    merged2 = pd.concat(out2, ignore_index=True)
    assert merged2["k"].tolist() == [-1] + list(range(500)) + [-2]
    # empty frames are tolerated
    out3 = list(_coalesce_frames(iter([pd.DataFrame({"k": []})]), 16))
    assert sum(len(f) for f in out3) == 0


def test_perform_every_fires_executor_side(spark):
    """performEvery parity (Utils.hs:23-38): callback every n rows
    with the running count, executor-side — observed through a Spark
    accumulator, pass-through rows unchanged."""
    from hadron_spark.operators.mapreduce import perform_every

    acc = spark.sparkContext.accumulator(0)

    def bump(i):
        acc.add(1)

    df = spark.range(0, 100, 1, 2)  # 2 partitions x 50 rows
    out = perform_every(df, 20, bump)
    assert out.count() == 100
    # per task: floor(50/20) = 2 ticks -> 4 total
    assert acc.value == 4


def test_chmod_sets_permissions(spark, tmp_path):
    import os
    import stat

    from hadron_spark.sources import fs

    p = tmp_path / "f.txt"
    p.write_text("x")
    fs.chmod(spark, str(p), "600")
    assert stat.S_IMODE(os.stat(p).st_mode) == 0o600
    fs.chmod(spark, str(p), "754")
    assert stat.S_IMODE(os.stat(p).st_mode) == 0o754
