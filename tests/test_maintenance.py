"""Table maintenance (merge/CDC/SCD2) and connected components."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hadron_spark.operators.graph import connected_components
from hadron_spark.operators.maintenance import cdc_apply, merge_upsert, scd2_close_out


def test_merge_upsert_replaces_and_inserts(spark):
    target = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    updates = spark.createDataFrame([Row(k=2, v="B2"), Row(k=9, v="new")])
    out = {r.k: r.v for r in merge_upsert(target, updates, ["k"]).collect()}
    assert out == {1: "a", 2: "B2", 3: "c", 9: "new"}


def test_merge_upsert_broadcasts_batch(spark):
    target = spark.createDataFrame([Row(k=i, v=str(i)) for i in range(100)])
    updates = spark.createDataFrame([Row(k=1, v="x")])
    plan = merge_upsert(target, updates, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_cdc_apply_latest_wins(spark):
    target = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    changes = spark.createDataFrame(
        [
            Row(k=1, v="a1", op="U", seq=1),
            Row(k=1, v=None, op="D", seq=2),  # delete wins (later seq)
            Row(k=2, v="old", op="U", seq=1),
            Row(k=2, v="b2", op="U", seq=5),  # latest update wins
            Row(k=7, v="ins", op="I", seq=1),
        ]
    )
    out = {r.k: r.v for r in cdc_apply(target, changes, ["k"]).collect()}
    assert out == {2: "b2", 3: "c", 7: "ins"}


def test_cdc_same_seq_tiebreak(spark):
    target = spark.createDataFrame([Row(k=1, v="a")])
    changes = spark.createDataFrame(
        [Row(k=1, v=None, op="D", seq=1), Row(k=1, v="re", op="U", seq=1)]
    )
    out = cdc_apply(target, changes, ["k"]).collect()
    assert [(r.k, r.v) for r in out] == [(1, "re")]
    # r07 shape: latest-change is a partial-aggregating max_by, no
    # row_number window / per-partition sort in the plan
    plan = (
        cdc_apply(target, changes, ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan and "max_by" in plan


def test_scd2_close_out(spark):
    hist = spark.createDataFrame(
        [
            Row(k=1, v="a", valid_from="2020", valid_to=None, is_current=True),
            Row(k=1, v="a0", valid_from="2010", valid_to="2020", is_current=False),
            Row(k=2, v="b", valid_from="2020", valid_to=None, is_current=True),
        ]
    )
    upd = spark.createDataFrame([Row(k=1, v="a2", ts="2024")])
    out = scd2_close_out(hist, upd, ["k"], "ts").collect()
    rows = {(r.k, r.v): r for r in out}
    assert len(out) == 4
    closed = rows[(1, "a")]
    assert closed.valid_to == "2024" and closed.is_current is False
    untouched = rows[(1, "a0")]
    assert untouched.valid_to == "2020" and untouched.is_current is False
    fresh = rows[(1, "a2")]
    assert fresh.valid_from == "2024" and fresh.valid_to is None and fresh.is_current
    assert rows[(2, "b")].is_current


def edges_df(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def test_cc_chain_and_clique(spark):
    # chain 1-2-3-4-5 (worst case), clique {10,11,12}, pair {20,21}
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (21, 20)]
    out = {r.node: r.component for r in connected_components(edges_df(spark, pairs)).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cc_isolated_nodes_and_self_loops(spark):
    pairs = [(1, 2), (3, 3)]
    nodes = spark.range(1, 6).select(F.col("id").alias("node"))
    out = {
        r.node: r.component
        for r in connected_components(edges_df(spark, pairs), nodes=nodes).collect()
    }
    assert out == {1: 1, 2: 1, 3: 3, 4: 4, 5: 5}


def test_cc_long_chain_converges_log_rounds(spark):
    n = 200
    pairs = [(i, i + 1) for i in range(1, n)]
    out = connected_components(edges_df(spark, pairs), max_iter=25)
    comps = {r.component for r in out.collect()}
    assert comps == {1}
    assert out.count() == n


def test_pagerank_star_graph(spark):
    from hadron_spark.operators.graph import pagerank

    # star: every leaf points at hub 0 → hub accumulates rank
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)], "src long, dst long"
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iters=10).collect()}
    assert len(ranks) == 6
    assert ranks[0] > max(v for k, v in ranks.items() if k != 0)
    # leaves have no in-edges → exactly the teleport mass (1-d)/N
    assert abs(ranks[1] - 0.15 / 6) < 1e-12
    # ranks are a probability-ish distribution (dangling hub leaks mass)
    assert 0 < sum(ranks.values()) <= 1.0 + 1e-9


def test_incremental_rollup_equals_full(spark, sf_dir):
    from pyspark.sql import functions as F

    from hadron_spark.operators.maintenance import incremental_rollup
    from hadron_spark.sources.taps import tap

    o = tap(f"{sf_dir}/orders.parquet").read(spark)

    def part(frame):
        return frame.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("s"),
        )

    k = F.col("o_orderkey")
    merged = incremental_rollup(
        part(o.filter(k % 3 == 0)),
        part(o.filter(k % 3 != 0)),
        ["o_orderpriority"],
        [F.sum("n").alias("n"), F.sum("s").alias("s")],
    )
    full = part(o)
    m = {r["o_orderpriority"]: (r["n"], r["s"]) for r in merged.collect()}
    f = {r["o_orderpriority"]: (r["n"], r["s"]) for r in full.collect()}
    assert m == f


def test_hll_rollup_merge_lossless_and_bounded(spark, sf_dir):
    """Union of the per-day sketches must equal the sketch of the
    whole dataset EXACTLY (register-max merge is lossless), and the
    estimate must sit within HLL's error envelope of the exact
    distinct (lg_k=12 -> rsd ~1.6%, allow 5%)."""
    from pyspark.sql import functions as F

    from hadron_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_rollup,
    )
    from hadron_spark.sources.taps import tap

    e = tap(f"{sf_dir}/events.parquet").read(spark).withColumn(
        "d", F.date_trunc("day", F.col("ts").cast("timestamp"))
    )
    day = hll_rollup(e, "d", "user_id", lg_k=12)
    merged = hll_estimate(hll_merge(day, [])).collect()[0]["est"]
    direct = hll_estimate(
        hll_rollup(e.withColumn("g", F.lit(1)), "g", "user_id", lg_k=12)
    ).collect()[0]["est"]
    assert merged == direct  # lossless union, not approximately
    exact = e.select("user_id").distinct().count()
    assert abs(merged - exact) <= max(1, 0.05 * exact)


def test_tree_depth_pointer_doubling(spark):
    """Chain + star + forest: depths match hand computation, and a
    500-node chain converges in O(log n) doubling rounds (the walk
    formulation would need 500)."""
    from hadron_spark.operators.graph import tree_depth

    df = spark.createDataFrame(
        [(0, None), (1, 0), (2, 0), (3, 1), (4, 3), (10, None), (11, 10)],
        "node long, parent long",
    )
    got = {r["node"]: r["depth"] for r in tree_depth(df).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3, 10: 0, 11: 1}

    chain = spark.createDataFrame(
        [(i, i - 1 if i else None) for i in range(500)], "node long, parent long"
    )
    out = tree_depth(chain, max_iter=12)  # 2^9 > 500 -> must converge
    assert out.agg({"depth": "max"}).first()[0] == 499


def test_hits_star_graph_analytic(spark):
    """Star u0 -> {v1..v4}: u0 is the pure hub (hub=1), the leaves
    are equal pure authorities (auth=1/2 each after L2 norm)."""
    from hadron_spark.operators.graph import hits

    e = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    s = {r.node: (r.hub, r.auth) for r in hits(e, iters=4).collect()}
    assert abs(s[0][0] - 1.0) < 1e-9 and abs(s[0][1]) < 1e-9
    for v in range(1, 5):
        assert abs(s[v][1] - 0.5) < 1e-9 and abs(s[v][0]) < 1e-9


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: each clique converges
    to its minimum node id; determinism under repartitioning."""
    from hadron_spark.operators.graph import label_propagation

    clique = lambda base: [
        (base + i, base + j) for i in range(4) for j in range(i + 1, 4)
    ]
    edges = clique(0) + clique(10) + [(3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r.label for r in label_propagation(df, iters=6).collect()}
    assert {out[i] for i in range(4)} == {0}
    assert {out[10 + i] for i in range(4)} == {10}
    out2 = {
        r.node: r.label
        for r in label_propagation(df.repartition(5), iters=6).collect()
    }
    assert out == out2


def test_triangle_count_clique_chain_messy_input(spark):
    """4-clique: 4 triangles, every member on 3; pendant chain adds
    none; duplicate/reversed edges and self-loops don't change the
    answer (canonicalization); bowtie apex counts both its
    triangles."""
    from hadron_spark.operators.graph import node_triangle_counts

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11)]
    messy = [(1, 0), (2, 2), (0, 1)]  # reversed dup + self-loop + dup
    edges = spark.createDataFrame(clique + chain + messy, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in node_triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    bowtie = [(0, 1), (0, 2), (1, 2), (0, 3), (0, 4), (3, 4)]
    e2 = spark.createDataFrame(bowtie, "src long, dst long")
    got2 = {r["node"]: r["n_triangles"] for r in node_triangle_counts(e2).collect()}
    assert got2 == {0: 2, 1: 1, 2: 1, 3: 1, 4: 1}


def test_clustering_coefficient_bowtie(spark):
    """Bowtie apex: deg 4, 2 triangles -> c = 4/12; leaves c = 1.0;
    pendant node deg 1 -> 0.0."""
    from hadron_spark.operators.graph import clustering_coefficient

    bowtie = [(0, 1), (0, 2), (1, 2), (0, 3), (0, 4), (3, 4), (4, 9)]
    e = spark.createDataFrame(bowtie, "src long, dst long")
    got = {r["node"]: r for r in clustering_coefficient(e).collect()}
    assert got[0]["clustering_coeff"] == 2 * 2 / (4 * 3)
    assert got[1]["clustering_coeff"] == 1.0 and got[1]["degree"] == 2
    assert got[9]["clustering_coeff"] == 0.0 and got[9]["n_triangles"] == 0
    assert got[4]["degree"] == 3 and got[4]["n_triangles"] == 1
    assert got[4]["clustering_coeff"] == 2 * 1 / (3 * 2)


def test_coreness_known_and_random(spark):
    """Clique + chain analytic values; random graph vs networkx-free
    peeling reference."""
    import itertools
    import random

    from hadron_spark.operators.graph import coreness

    # 5-clique (coreness 4 each) + tail chain (coreness 1)
    clique = list(itertools.combinations(range(5), 2))
    chain = [(4, 10), (10, 11), (11, 12)]
    e = spark.createDataFrame(clique + chain, "src long, dst long")
    got = {r["node"]: r["coreness"] for r in coreness(e).collect()}
    assert all(got[v] == 4 for v in range(5))
    assert got[10] == got[11] == got[12] == 1

    rng = random.Random(3)
    edges = {(rng.randint(0, 40), rng.randint(0, 40)) for _ in range(150)}
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["coreness"] for r in coreness(df).collect()}
    ref = _peel_reference(edges)
    assert got == ref


def _peel_reference(edges):
    """Textbook min-degree peeling: core number = peel round degree
    (monotone max as removal degree)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    live = {v: set(ns) for v, ns in adj.items()}
    core = {}
    current = 0
    while live:
        v = min(live, key=lambda x: (len(live[x]), x))
        current = max(current, len(live[v]))
        core[v] = current
        for u in live[v]:
            live[u].discard(v)
        del live[v]
    return core


def test_bipartite_project_weights_and_guard(spark):
    """Co-occurrence weights exact; min_weight prunes; oversized
    groups drop entirely (guard), small ones survive."""
    from hadron_spark.operators.graph import bipartite_project

    rows = [
        (1, "x"), (1, "y"), (1, "z"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "y"),
        (4, "p"), (4, "q"), (4, "r"), (4, "s"),  # size-4 group
    ]
    df = spark.createDataFrame(rows, "g long, i string")
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in bipartite_project(df, "g", "i").collect()
    }
    assert got[("x", "y")] == 3 and got[("x", "z")] == 1
    assert got[("p", "q")] == 1 and len(got) == 3 + 6
    w2 = {
        (r["src"], r["dst"])
        for r in bipartite_project(df, "g", "i", min_weight=2).collect()
    }
    assert w2 == {("x", "y")}
    guarded = {
        (r["src"], r["dst"])
        for r in bipartite_project(df, "g", "i", max_group_size=3).collect()
    }
    assert ("p", "q") not in guarded and ("x", "z") in guarded


def test_compaction_plan_next_fit(spark):
    """Next-fit bins at floor(cum_before/target): handcrafted sizes
    split per partition, ordered member lists, oversize file alone
    in its span, validation on target."""
    import pytest

    from hadron_spark.operators.maintenance import compaction_plan

    rows = [
        ("p1", "a", 5), ("p1", "b", 5), ("p1", "c", 5),
        ("p1", "d", 5), ("p1", "e", 12), ("p1", "f", 3),
        ("p2", "a", 25),
    ]
    df = spark.createDataFrame(rows, "part string, fid string, sz long")
    plan = compaction_plan(df, "sz", 10, part_cols=["part"], order_col="fid")
    got = {
        (r["part"], r["bin"]): (r["n_files"], r["total_bytes"], r["files"])
        for r in plan.collect()
    }
    assert got[("p1", 0)] == (2, 10, ["a", "b"])
    assert got[("p1", 1)] == (2, 10, ["c", "d"])
    assert got[("p1", 2)] == (1, 12, ["e"])
    assert got[("p1", 3)] == (1, 3, ["f"])
    assert got[("p2", 0)] == (1, 25, ["a"])
    with pytest.raises(ValueError):
        compaction_plan(df, "sz", 0, part_cols=["part"], order_col="fid")


def test_retention_plan_keep_last_and_cutoff(spark):
    """Newest keep_last per partition keep; cutoff rescues older
    rows; the rest expire; keep_last=0 with no cutoff expires all."""
    import pytest

    from hadron_spark.operators.maintenance import retention_plan

    rows = [
        ("t1", f"2024-01-{d:02d} 00:00:00") for d in range(1, 11)
    ] + [("t2", "2024-03-01 00:00:00")]
    df = spark.createDataFrame(rows, "tbl string, ts string").select(
        "tbl", F.to_timestamp("ts").alias("ts")
    )
    plan = retention_plan(
        df, "ts", keep_last=2, cutoff="2024-01-05", part_cols=["tbl"]
    )
    got = {
        (r["tbl"], str(r["ts"])[:10]): r["action"] for r in plan.collect()
    }
    for d in range(1, 5):
        assert got[("t1", f"2024-01-{d:02d}")] == "expire"
    for d in range(5, 11):
        assert got[("t1", f"2024-01-{d:02d}")] == "keep"
    assert got[("t2", "2024-03-01")] == "keep"
    nall = retention_plan(df, "ts", keep_last=0, part_cols=["tbl"])
    assert all(r["action"] == "expire" for r in nall.collect())
    with pytest.raises(ValueError):
        retention_plan(df, "ts", keep_last=-1, part_cols=["tbl"])


def test_common_neighbors_reference(spark):
    """Counts and Jaccard vs hand-enumerated wedges on a small
    graph; max_degree drops hub apexes whole; min_common filter;
    validation."""
    import pytest

    from hadron_spark.operators.graph import common_neighbors

    # star hub h--(1,2,3) plus path 1--2, 2--3
    edges = [("h", "1"), ("h", "2"), ("h", "3"), ("1", "2"), ("2", "3")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["a"], r["b"]): (r["common"], r["deg_a"], r["deg_b"], r["jaccard"])
        for r in common_neighbors(df).collect()
    }
    # N(h)={1,2,3} N(1)={h,2} N(2)={h,1,3} N(3)={h,2}
    assert got[("1", "2")][0] == 1  # common: h... plus? N1∩N2={h}
    assert got[("1", "3")] == (2, 2, 2, 2 / 2)  # {h,2}; union = 2
    assert got[("2", "h")][0] == 2  # {1,3}
    assert got[("1", "h")] == (1, 2, 3, 1 / 4)
    # deg: h=3, 1=2, 2=3, 3=2 — cap 2 drops apexes h AND 2 whole;
    # the surviving apexes 1 and 3 each certify (2, h)
    capped = {
        (r["a"], r["b"]): r["common"]
        for r in common_neighbors(df, max_degree=2).collect()
    }
    assert capped == {("2", "h"): 2}
    mc = {
        (r["a"], r["b"])
        for r in common_neighbors(df, min_common=2).collect()
    }
    assert mc == {("1", "3"), ("2", "h")}
    with pytest.raises(ValueError):
        common_neighbors(df, min_common=0)


def test_compaction_execute_roundtrip(spark, tmp_path):
    """Execute leg of the compaction contract: multi-file bins
    rewrite to ONE .compact file, originals are deleted, row content
    is byte-identical; single-file bins skip; keep_originals mode
    leaves sources in place; crash-heal path (tmp present, originals
    gone) promotes the tmp."""
    import os

    from pyspark.sql import functions as F

    from hadron_spark.operators.maintenance import (
        compaction_execute,
        compaction_plan,
    )
    from hadron_spark.sources import fs

    root = tmp_path / "store"
    root.mkdir()
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    # 6 small files + 1 "big" file
    paths = []
    for i in range(6):
        p = str(root / f"small-{i}.parquet")
        df.filter((F.col("id") % 6) == i).coalesce(1).write.parquet(p + ".d")
        part = [
            e.path for e in fs.ls(spark, p + ".d")
            if e.path.endswith(".parquet") or "part-" in e.path.rsplit("/", 1)[1]
        ]
        part = [x for x in part if not x.endswith("_SUCCESS")]
        fs.mv(spark, part[0], p)
        fs.delete(spark, p + ".d")
        paths.append(p)
    listing = [(p, fs.ls(spark, p)[0].size) for p in paths]
    total_sz = sum(s for _, s in listing)
    files = spark.createDataFrame(listing, "path string, bytes long")
    # target sized so ~3 files fit per bin -> 2 multi-file bins
    plan = compaction_plan(files, "bytes", total_sz // 2 + 1, order_col="path")
    bins = plan.collect()
    assert sum(r["n_files"] for r in bins) == 6

    res = compaction_execute(spark, plan).collect()
    assert {r["action"] for r in res} <= {"compacted", "skipped"}
    compacted = [r for r in res if r["action"] == "compacted"]
    assert compacted
    # originals of compacted bins are gone; .compact files exist
    survivors = [e.path for e in fs.ls(spark, str(root))]
    assert all(p not in survivors for p in paths if len(bins) > 1)
    back = spark.read.parquet(*survivors)
    assert back.count() == 1000
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(1000))

    # crash-safety ordering: the heal predicate is `tmp exists AND
    # paths[0] missing`, so paths[0] must be deleted LAST — a crash
    # mid-delete-loop must leave paths[0] present (re-plan path), never
    # the promotable state with leftover originals (silent duplication).
    import hadron_spark.sources.fs as fs_mod

    root3 = tmp_path / "store3"
    root3.mkdir()
    for i in range(3):
        p = str(root3 / f"c{i}.parquet")
        df.filter((F.col("id") % 3) == i).coalesce(1).write.parquet(p + ".d")
        part = [
            e.path for e in fs.ls(spark, p + ".d")
            if "part-" in e.path.rsplit("/", 1)[1] and not e.path.endswith("_SUCCESS")
        ]
        fs.mv(spark, part[0], p)
        fs.delete(spark, p + ".d")
    l3 = [(str(root3 / f"c{i}.parquet"),
           fs.ls(spark, str(root3 / f"c{i}.parquet"))[0].size) for i in range(3)]
    f3 = spark.createDataFrame(l3, "path string, bytes long")
    plan3 = compaction_plan(f3, "bytes", 10**9, order_col="path")
    [bin3] = plan3.collect()
    deletes = []
    real_delete = fs_mod.delete

    def recording_delete(spark_, path):
        deletes.append(path)
        return real_delete(spark_, path)

    monkeypatch_ok = False
    try:
        fs_mod.delete = recording_delete
        compaction_execute(spark, plan3)
        monkeypatch_ok = True
    finally:
        fs_mod.delete = real_delete
    assert monkeypatch_ok
    originals3 = list(bin3["files"])
    order = [deletes.index(p) for p in originals3 if p in deletes]
    assert len(order) == 3
    # first-listed original deleted strictly after every other original
    assert order[0] == max(order)

    # keep_originals: dry-run-with-artifacts
    root2 = tmp_path / "store2"
    root2.mkdir()
    for i in range(2):
        p = str(root2 / f"s{i}.parquet")
        df.filter((F.col("id") % 2) == i).coalesce(1).write.parquet(p + ".d")
        part = [
            e.path for e in fs.ls(spark, p + ".d")
            if "part-" in e.path.rsplit("/", 1)[1] and not e.path.endswith("_SUCCESS")
        ]
        fs.mv(spark, part[0], p)
        fs.delete(spark, p + ".d")
    l2 = [(str(root2 / f"s{i}.parquet"),
           fs.ls(spark, str(root2 / f"s{i}.parquet"))[0].size) for i in range(2)]
    f2 = spark.createDataFrame(l2, "path string, bytes long")
    plan2 = compaction_plan(f2, "bytes", 10**9, order_col="path")
    compaction_execute(spark, plan2, keep_originals=True)
    names2 = {e.path.rsplit("/", 1)[1] for e in fs.ls(spark, str(root2))}
    assert {"s0.parquet", "s1.parquet"} <= names2
    assert any(n.endswith(".compact") for n in names2)
