"""Round-4 SCALE extension (VERDICT r3 #7): push the round-3 ladder
to 256× for repeated_spans / DSIR / unigram, and sweep the substring
window (w=8/16/32) — fingerprint volume is linear in the corpus but
the constant matters. APPENDS to SCALE.md (the main probe rewrites
it; this one extends).

Run: python tools/scale_probe_r4.py [sf_dir] [k1,k2,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scale_probe import blow_up  # same replica semantics as r3


def main() -> None:
    from hadron_spark import get_spark
    from hadron_spark.llm.dedup import repeated_spans
    from hadron_spark.llm.dsir import dsir_scores
    from hadron_spark.llm.unigram import unigram_train
    from hadron_spark.operators.ops import hash_bucket

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ks = [
        int(x)
        for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["64", "256"])
    ]
    spark = get_spark("scale_probe_r4")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )

    def probe_spans(d):
        return repeated_spans(d, window=8).count()  # default: recompute

    def probe_dsir(d):
        target = d.filter(hash_bucket(F.col("doc_id"), 16) == 0)
        return dsir_scores(d, target, n_buckets=4096).count()

    def probe_unigram(d):
        st: dict = {}
        pieces, _ = unigram_train(
            d, vocab_size=64, seed_size=256, max_piece_len=5, stats=st
        )
        return len(pieces) * 1000 + st["rounds"]

    OPS = {
        "repeated_spans_w8 (recompute)": probe_spans,
        "dsir_scores": probe_dsir,
        "unigram_train_v64": probe_unigram,
    }
    results: dict[str, dict[int, tuple[float, int]]] = {op: {} for op in OPS}
    for k in ks:
        d = blow_up(base, k).repartition(32).localCheckpoint()
        for op, fn in OPS.items():
            t0 = time.time()
            n_out = fn(d)
            results[op][k] = (round(time.time() - t0, 2), int(n_out))
        d.unpersist()

    # window sweep at the smallest ladder rung
    kw = min(ks)
    d = blow_up(base, kw).repartition(32).localCheckpoint()
    wsweep: dict[int, tuple[float, int]] = {}
    for w in (8, 16, 32):
        t0 = time.time()
        n = repeated_spans(d, window=w).count()
        wsweep[w] = (round(time.time() - t0, 2), int(n))
    d.unpersist()

    lines = [
        "",
        f"## Round-4 ladder extension (ks={ks}, sf_dir={sf_dir};",
        "same near-duplicate replica semantics as the round-3 ladder;",
        "repeated_spans runs the new storage-free 'recompute' default):",
        "",
        "| op | "
        + " | ".join(f"k={k} wall / out" for k in ks)
        + " | wall × |",
        "|---|" + "---|" * (len(ks) + 1),
    ]
    for op, r in results.items():
        ratio = r[max(ks)][0] / max(r[min(ks)][0], 0.01)
        lines.append(
            f"| {op} | "
            + " | ".join(f"{r[k][0]:.2f}s / {r[k][1]:,}" for k in ks)
            + f" | {ratio:.1f}× |"
        )
    lines += [
        "",
        f"Window-size sweep (repeated_spans at k={kw}): fingerprint",
        "volume is one row per token position regardless of w, so wall",
        "should be ~flat in w (the per-position constant grows with the",
        "concat width only):",
        "",
        "| w | wall | islands |",
        "|---|---|---|",
    ]
    for w, (wall, n) in wsweep.items():
        lines.append(f"| {w} | {wall:.2f}s | {n:,} |")
    lines.append("")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE.md",
    )
    with open(path, "a") as fh:
        fh.write("\n".join(lines))
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
