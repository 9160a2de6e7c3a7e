"""Sequence packing (llm.packing): range_cumsum prefix math and the
concat-and-chunk span invariants a trainer relies on."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hadron_spark.llm import packing
from hadron_spark.operators import ops


def test_range_cumsum_matches_builtin_window(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = ops.range_cumsum(
        df, key=F.col("k"), val=F.col("v"), order=[F.col("k")], out_col="p", buckets=8
    )
    from pyspark.sql import Window

    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("p", F.coalesce(F.sum("v").over(w), F.lit(0)))
    assert sorted(got.collect()) == sorted(want.collect())
    # inclusive variant
    got_i = ops.range_cumsum(
        df, key=F.col("k"), val=F.col("v"), order=[F.col("k")],
        out_col="p", inclusive=True, buckets=8,
    )
    w2 = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want_i = df.withColumn("p", F.sum("v").over(w2))
    assert sorted(got_i.collect()) == sorted(want_i.collect())


def test_pack_sequences_invariants(spark):
    # doc lengths engineered to straddle boundaries; include a zero-
    # length doc (must vanish from spans without shifting offsets)
    lens = [5, 0, 130, 7, 128, 1, 300, 64, 63, 2]
    df = spark.createDataFrame(list(enumerate(lens)), "doc_id long, n long")
    packed = packing.pack_sequences(df, "doc_id", F.col("n"), seq_len=128)
    rows = packed.collect()
    total = sum(lens)
    # every token accounted exactly once
    assert sum(r.n_tok for r in rows) == total
    # spans lie inside [0, seq_len), non-empty, consistent
    for r in rows:
        assert 0 <= r.begin_in_seq < r.end_in_seq <= 128
        assert r.n_tok == r.end_in_seq - r.begin_in_seq
        assert r.doc_offset >= 0
    # zero-length doc emits nothing
    assert not [r for r in rows if r.doc_id == 1]
    # doc 6 (300 tokens) spans ceil+1 sequences contiguously
    d6 = sorted((r for r in rows if r.doc_id == 6), key=lambda r: r.seq_id)
    assert [r.seq_id for r in d6] == list(
        range(d6[0].seq_id, d6[0].seq_id + len(d6))
    )
    assert sum(r.n_tok for r in d6) == 300
    assert d6[0].doc_offset == 0
    # per-doc offsets chain: each later span starts where prior ended
    off = 0
    for r in d6:
        assert r.doc_offset == off
        off += r.n_tok
    # stats: all sequences full except the last
    stats = packing.packing_stats(packed).collect()
    last = max(s.seq_id for s in stats)
    for s in stats:
        if s.seq_id != last:
            assert s.fill_tokens == 128 and s.first_begin == 0 and s.last_end == 128
    assert sum(s.fill_tokens for s in stats) == total


def test_pack_sequences_rejects_bad_seq_len(spark):
    df = spark.createDataFrame([(0, 1)], "doc_id long, n long")
    with pytest.raises(ValueError):
        packing.pack_sequences(df, "doc_id", F.col("n"), seq_len=0)


def test_write_packed_shards_layout_and_manifest(spark, tmp_path):
    import os

    lens = [100, 200, 50, 300, 128, 64, 90, 10]
    df = spark.createDataFrame(list(enumerate(lens)), "doc_id long, n long")
    packed = packing.pack_sequences(df, "doc_id", F.col("n"), seq_len=128)
    out = str(tmp_path / "shards")
    manifest = packing.write_packed_shards(packed, out, seqs_per_shard=2)
    rows = {r.shard: r for r in manifest.collect()}
    spans = packed.collect()
    # manifest agrees with a from-scratch derivation of the sharding
    want = {}
    for r in spans:
        s = r.seq_id // 2
        n, mn, mx = want.get(s, (0, None, None))
        want[s] = (
            n + 1,
            r.seq_id if mn is None else min(mn, r.seq_id),
            r.seq_id if mx is None else max(mx, r.seq_id),
        )
    assert {s: (r.n_spans, r.min_seq, r.max_seq) for s, r in rows.items()} == want
    # every shard dir readable and internally sorted by (seq, begin)
    for d in os.listdir(out):
        if not d.startswith("_shard="):
            continue
        pdf = spark.read.parquet(os.path.join(out, d)).toPandas()
        key = list(zip(pdf.seq_id, pdf.begin_in_seq))
        assert key == sorted(key)


def test_range_cumsum_stable_under_partitioning(spark):
    rows = [(i * 3 + 1, (i * 17) % 7 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, v long")
    outs = []
    for nb, parts in [(4, 2), (16, 8), (32, 3)]:
        d = df.repartition(parts)
        got = ops.range_cumsum(
            d, key=F.col("k"), val=F.col("v"), order=[F.col("k")],
            out_col="p", buckets=nb,
        )
        outs.append(sorted((r.k, r.p) for r in got.collect()))
    assert outs[0] == outs[1] == outs[2]
    # spot-check against the sequential definition
    seq, acc = {}, 0
    for k, v in sorted(rows):
        seq[k] = acc
        acc += v
    assert dict(outs[0]) == seq


def test_preference_pairs(spark):
    """Extrema pick best/worst; ties break to higher (chosen) /
    lower (rejected) id; single-response prompts and sub-margin gaps
    drop; one partial-agg'd shuffle."""
    from pyspark.sql import functions as F

    from hadron_spark.llm.packing import preference_pairs
    from hadron_spark.plans.inspect import assert_partial_aggregation, shuffle_count

    rows = [
        # prompt 0: clear winner/loser
        (0, 1, "bad", 1), (0, 2, "ok", 5), (0, 3, "best", 9),
        # prompt 1: all tied at 4 → chosen id 12, rejected id 10, gap 0
        (1, 10, "a", 4), (1, 11, "b", 4), (1, 12, "c", 4),
        # prompt 2: single response → no pair
        (2, 20, "solo", 7),
        # prompt 3: gap 2 < margin 3 → dropped
        (3, 30, "x", 5), (3, 31, "y", 7),
    ]
    df = spark.createDataFrame(
        rows, "prompt_id long, response_id long, response string, score long"
    )
    out = preference_pairs(df, min_margin=3)
    # plan asserts BEFORE execution: AQE's finalized plan string
    # renders the materialized stage with a second Exchange line
    assert shuffle_count(out) == 1
    assert_partial_aggregation(out)
    got = {r["prompt_id"]: r for r in out.collect()}
    assert set(got) == {0}
    assert (got[0]["chosen_id"], got[0]["chosen"]) == (3, "best")
    assert (got[0]["rejected_id"], got[0]["rejected"]) == (1, "bad")
    assert got[0]["n_candidates"] == 3
    # margin 0 keeps the tied prompt with the documented tie-break
    tied = {r["prompt_id"]: r for r in preference_pairs(df).collect()}
    assert (tied[1]["chosen_id"], tied[1]["rejected_id"]) == (12, 10)
    assert 2 not in tied  # single response never pairs


def test_chunk_text_tokens_reference(spark):
    """Sliding-window chunking vs a python mirror: coverage (every
    token appears in some chunk), overlap stride, short-doc identity,
    exact-multiple boundary, token-less docs emit nothing, and
    validation."""
    import pytest
    from pyspark.sql import functions as F

    from hadron_spark.llm.packing import chunk_text_tokens

    texts = {
        1: "a b c d e f g h i j",            # 10 tokens
        2: "one two three",                   # short -> single chunk
        3: " ".join(f"w{i}" for i in range(8)),  # exact 2x stride case
        4: "   ",                             # token-less -> no rows
        5: "x",                               # single token
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")

    def ref(text, c, o):
        toks = [w for w in text.split() if w]
        if not toks:
            return []
        s = c - o
        n = len(toks)
        m = 1 if n <= c else 2 + (n - c - 1) // s
        return [
            (j, j * s, min(c, n - j * s), " ".join(toks[j * s: j * s + c]))
            for j in range(m)
        ]

    for c, o in [(4, 1), (4, 0), (3, 2), (10, 0), (1, 0)]:
        got = {
            (r["doc_id"], r["chunk_id"]):
                (r["start_token"], r["n_tokens"], r["chunk"])
            for r in chunk_text_tokens(
                df, chunk_tokens=c, overlap_tokens=o
            ).collect()
        }
        want = {
            (d, j): (st, nt, ch)
            for d, t in texts.items()
            for j, st, nt, ch in ref(t, c, o)
        }
        assert got == want, (c, o)
        # coverage: concatenating stride-slices reconstructs the doc
        for d, t in texts.items():
            toks = t.split()
            toks = [w for w in toks if w]
            if not toks:
                assert not any(k[0] == d for k in got)
                continue
            s = c - o
            rebuilt = []
            for j in range(len([k for k in got if k[0] == d])):
                chunk = got[(d, j)][2].split()
                rebuilt.extend(chunk if j == 0 else chunk[o:])
            assert rebuilt == toks, (d, c, o)

    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_text_tokens(df, chunk_tokens=0)
    with pytest.raises(ValueError, match="overlap_tokens"):
        chunk_text_tokens(df, chunk_tokens=4, overlap_tokens=4)
