"""Fan-out sink (SURVEY §2.1 S7-S9, Run/FanOut.hs)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hadron_spark.sources.fanout import fan_out_by, fan_out_write, partitioned_write
from hadron_spark.sources.taps import tap


def test_fan_out_write_routes_and_stats(spark, sf_dir, tmp_path):
    li = tap(f"{sf_dir}/lineitem.parquet").read(spark)
    out = str(tmp_path / "by_flag")
    stats = fan_out_write(li, out, "l_returnflag")
    stat_map = {r["route"]: r["rows"] for r in stats.collect()}
    assert sum(stat_map.values()) == li.count()
    # hive-style dirs exist per route value
    dirs = {d for d in os.listdir(out) if d.startswith("_route=")}
    assert dirs == {f"_route={k}" for k in stat_map}
    # read back one route
    one = spark.read.parquet(f"{out}/_route=A")
    assert one.count() == stat_map["A"]


def test_fan_out_computed_route_sequential(spark, sf_dir, tmp_path):
    orders = tap(f"{sf_dir}/orders.parquet").read(spark)
    out = str(tmp_path / "by_year")
    stats = fan_out_by(
        orders, out, lambda df: F.year("o_orderdate").cast("string"),
        sequential=True,
    )
    assert stats.count() > 1


def test_partitioned_write(spark, sf_dir, tmp_path):
    c = tap(f"{sf_dir}/customer.parquet").read(spark)
    out = str(tmp_path / "by_seg")
    partitioned_write(c, out, ["c_mktsegment"])
    back = spark.read.parquet(out)
    assert back.count() == c.count()


def test_fan_out_stats_do_not_rescan_source(spark, tmp_path):
    """VERDICT r1 #3: fanStats must come from the committed output
    (parquet footers), not a second pass over the input lineage.
    Pin: delete the SOURCE after the write — the stats must still
    collect, which the old lazy groupBy-over-source could not do."""
    import shutil

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, "ab"[i % 2]) for i in range(100)], "id long, r string"
    ).write.parquet(src)
    df = spark.read.parquet(src)
    out = str(tmp_path / "out")
    stats = fan_out_write(df, out, "r")
    shutil.rmtree(src)  # source gone — only the written output remains
    got = {r["route"]: r["rows"] for r in stats.collect()}
    assert got == {"a": 50, "b": 50}


def test_fan_out_stats_null_and_escaped_routes(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x=1"), (2, None), (3, "x=1"), (4, "plain")],
        "id long, r string",
    )
    out = str(tmp_path / "esc")
    stats = fan_out_write(df, out, "r")
    got = {r["route"]: r["rows"] for r in stats.collect()}
    # percent-encoded dir names decode back; hive null sentinel -> None
    assert got == {"x=1": 2, None: 1, "plain": 1}


def test_fan_out_arbitrary_paths(spark, tmp_path):
    """S7 full semantics: records land at literally computed absolute
    paths (nested dirs created, tmp-then-rename finalize), stats =
    fanStats per-path counts."""
    import json

    from hadron_spark.sources.fanout import fan_out_arbitrary

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "a", "y"), (4, "a", "x")],
        "id long, g string, sub string",
    )
    base = str(tmp_path)
    stats = fan_out_arbitrary(
        df, F.format_string(base + "/%s/part-%s.jsonl", "g", "sub")
    )
    got = {r["path"]: r["rows"] for r in stats.collect()}
    assert got == {
        f"{base}/a/part-x.jsonl": 2,
        f"{base}/a/part-y.jsonl": 1,
        f"{base}/b/part-x.jsonl": 1,
    }
    lines = [
        json.loads(line)
        for line in open(f"{base}/a/part-x.jsonl")
        if line.strip()
    ]
    assert sorted(r["id"] for r in lines) == [1, 4]
    assert set(lines[0]) == {"id", "g", "sub"}  # no _path leakage
    # no tmp droppings left behind
    import glob

    assert not glob.glob(base + "/**/._hadron_fan_*", recursive=True)


def test_fan_out_arbitrary_hot_route_cap(spark, tmp_path):
    """max_rows_per_task splits a dominant route across multiple
    writer tasks (path.part-N shards) even under single_writer=True,
    while cold routes keep their exact computed filename and stats
    still roll up to the logical route — the 100 TB skew bound."""
    import glob
    import json

    from hadron_spark.sources.fanout import fan_out_arbitrary

    base = str(tmp_path)
    # one hot route (90 rows) + one cold route (5 rows)
    df = spark.createDataFrame(
        [(i, "hot" if i < 90 else "cold") for i in range(95)],
        "id long, g string",
    ).repartition(8)
    stats = fan_out_arbitrary(
        df,
        F.concat(F.lit(base + "/"), "g", F.lit(".jsonl")),
        max_rows_per_task=25,
        shard_key="id",  # exact-cap mode: row_number over a unique key
    )
    got = {r["path"]: r["rows"] for r in stats.collect()}
    assert got == {f"{base}/hot.jsonl": 90, f"{base}/cold.jsonl": 5}
    shards = sorted(glob.glob(base + "/hot.jsonl.part-*"))
    assert len(shards) == 4  # ceil(90/25)
    ids = []
    for s in shards:
        rows = [json.loads(x) for x in open(s) if x.strip()]
        assert len(rows) <= 25
        ids += [r["id"] for r in rows]
    assert sorted(ids) == list(range(90))
    # cold route: under the cap -> exact filename, no shards
    assert not glob.glob(base + "/cold.jsonl.part-*")
    cold = [json.loads(x) for x in open(f"{base}/cold.jsonl") if x.strip()]
    assert sorted(r["id"] for r in cold) == list(range(90, 95))


def test_fan_out_arbitrary_hot_route_hash_mode_deterministic(
    spark, tmp_path
):
    """Without shard_key the shard is a pure content hash — two runs
    over differently-partitioned input produce byte-identical shard
    contents (the retry-determinism contract from ADVICE r3), and the
    union of shards is lossless. Shard sizes are binomial around the
    cap in this mode, so no per-shard <=cap assertion."""
    import glob
    import json

    from hadron_spark.sources.fanout import fan_out_arbitrary

    df = spark.createDataFrame(
        [(i, "hot") for i in range(80)], "id long, g string"
    )

    def run(base, parts):
        fan_out_arbitrary(
            df.repartition(parts),
            F.concat(F.lit(base + "/"), "g", F.lit(".jsonl")),
            max_rows_per_task=20,
        )
        out = {}
        for s in glob.glob(base + "/hot.jsonl.part-*"):
            out[s.rsplit("/", 1)[-1]] = sorted(
                json.loads(x)["id"] for x in open(s) if x.strip()
            )
        return out

    a = run(str(tmp_path / "a"), 8)
    b = run(str(tmp_path / "b"), 3)
    assert a == b  # same shard -> same rows, regardless of input layout
    assert sorted(i for ids in a.values() for i in ids) == list(range(80))
    assert len(a) <= 4  # ceil(80/20) buckets


def test_fan_out_arbitrary_sharded_and_csv(spark, tmp_path):
    from hadron_spark.sources.fanout import fan_out_arbitrary

    base = str(tmp_path)
    df = spark.createDataFrame(
        [(i, "ab"[i % 2]) for i in range(40)], "id long, g string"
    ).repartition(4)
    stats = fan_out_arbitrary(
        df,
        F.concat(F.lit(base + "/"), "g", F.lit(".csv")),
        fmt="csv",
        single_writer=False,
    )
    got = {r["path"]: r["rows"] for r in stats.collect()}
    # shard stats roll up to the logical path
    assert got == {f"{base}/a.csv": 20, f"{base}/b.csv": 20}
    import glob

    shards = glob.glob(base + "/a.csv.part-*")
    assert shards  # per-task shard files exist
    n = sum(len(open(s).read().strip().splitlines()) for s in shards)
    assert n == 20
