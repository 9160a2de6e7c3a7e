"""Empirical scaling probe: blow the documents corpus up k× and
measure the LLM-op headliners at each size. The 100 TB argument is a
design argument (banded joins, bucket guards, partial aggs) — this
records the measurable part locally: near-linear wall-clock in input
size, no quadratic blowup as duplicate density grows.

Each replica r gets doc_id + r·10⁹ and a ' v<r>' text suffix, so
replicas are NEAR-duplicates (minhash/simhash candidate load grows
with k — the adversarial direction for banded dedup) while exact
dedup still sees distinct texts.

Run: python tools/scale_probe.py [sf_dir] [k1,k2,...]
Writes SCALE.md at the repo root.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def blow_up(docs, k: int):
    parts = []
    for r in range(k):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * 1_000_000_000)).alias("doc_id"),
                "source",
                F.concat(F.col("text"), F.lit(f" v{r}")).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def blow_up_lineitem(li, k: int):
    parts = []
    for r in range(k):
        parts.append(
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(r * 1_000_000_000)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    from hadron_spark import get_spark
    from hadron_spark.functions.text import (
        dedup_lines,
        html_to_text,
        redact_pii,
        token_count,
        tokenize,
    )
    from hadron_spark.llm.dedup import exact_dedup, minhash_lsh_pairs, simhash_near_pairs
    from hadron_spark.llm.embeddings import gram_matrix
    from hadron_spark.llm.packing import pack_sequences

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ks = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["1", "4", "16"])]
    spark = get_spark("scale_probe")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    n_base = base.count()

    OPS = {
        "exact_dedup": lambda d: exact_dedup(d).count(),
        "minhash_pairs": lambda d: minhash_lsh_pairs(
            d, num_hashes=32, bands=8
        ).count(),
        "simhash_pairs": lambda d: simhash_near_pairs(d, max_hamming=3).count(),
        "hygiene_chain": lambda d: d.select(
            redact_pii(dedup_lines(html_to_text(F.concat(
                F.lit("<p>"), F.col("text"), F.lit("</p><p>Subscribe</p>")
            )))).alias("t")
        ).agg(F.sum(F.size(tokenize(F.col("t")))).alias("n")).first()["n"],
        "pack_sequences": lambda d: pack_sequences(
            d, "doc_id", token_count(F.col("text")), seq_len=2048
        ).count(),
    }

    li_base = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_li = li_base.count()

    emb_base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_emb = emb_base.count()

    def blow_up_emb(e, k: int):
        parts = [
            e.withColumn("vec_id", F.col("vec_id") + F.lit(r * 1_000_000_000))
            for r in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    EMB_OPS = {
        # output is the constant d(d+1)/2+d+1 cell set — wall must
        # track input linearly (one Arrow pass + tiny partial shuffle)
        "gram_matrix": lambda e: gram_matrix(e).count(),
    }

    def pricing(d):
        # q01 shape: exact-decimal pricing summary, one partial-agg'd
        # exchange onto 6 cells
        return d.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"),
            F.count(F.lit(1)).alias("n"),
        ).count()

    def topk_per_key(d):
        # q44 shape: per-order top-2 items by price (window group limit)
        from pyspark.sql import Window

        w = Window.partitionBy("l_orderkey").orderBy(
            F.col("l_extendedprice").desc(), F.col("l_linenumber")
        )
        return (
            d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2)
            .count()
        )

    FACT_OPS = {"pricing_agg": pricing, "topk_per_key": topk_per_key}

    results: dict[str, dict[int, tuple[float, int]]] = {op: {} for op in OPS}
    fact_results: dict[str, dict[int, tuple[float, int]]] = {
        op: {} for op in FACT_OPS
    }
    emb_results: dict[str, dict[int, tuple[float, int]]] = {
        op: {} for op in EMB_OPS
    }
    for k in ks:
        d = blow_up(base, k).repartition(32).localCheckpoint()  # fix input layout
        for op, fn in OPS.items():
            t0 = time.time()
            n_out = fn(d)
            results[op][k] = (round(time.time() - t0, 2), int(n_out))
        d.unpersist()
        # the blown-up fact is a narrow union over the parquet scan —
        # cheap to re-derive per op, and 150M+ checkpointed rows would
        # pressure executor storage for no benefit (each op reads it
        # once)
        li = blow_up_lineitem(li_base, k)
        for op, fn in FACT_OPS.items():
            t0 = time.time()
            n_out = fn(li)
            fact_results[op][k] = (round(time.time() - t0, 2), int(n_out))
        em = blow_up_emb(emb_base, k)
        for op, fn in EMB_OPS.items():
            t0 = time.time()
            n_out = fn(em)
            emb_results[op][k] = (round(time.time() - t0, 2), int(n_out))

    lines = [
        "# SCALE — measured scaling of the LLM-op headliners",
        "",
        f"Corpus: `{sf_dir}/documents.parquet` ({n_base} docs) replicated",
        "k× with near-duplicate variation (each replica is a near-dup of",
        "its base doc — the ADVERSARIAL direction for banded dedup: every",
        "duplicate cluster is k docs wide); local[32]; see",
        "tools/scale_probe.py. `wall ×` compares t(k_max)/t(k_min)",
        f"against the {max(ks)//min(ks)}× input growth. For the pair-",
        "enumeration ops the OUTPUT is intrinsically quadratic in",
        "cluster width (C(k,2) pairs per base doc), so the honest",
        "figure is `out-rows/s` — the enumeration rate must hold or",
        "grow as clusters widen.",
        "",
        "| op | "
        + " | ".join(f"k={k} wall / out" for k in ks)
        + " | wall × | out-rows/s @k_max |",
        "|---|" + "---|" * (len(ks) + 2),
    ]
    for op, r in results.items():
        wall_ratio = r[max(ks)][0] / max(r[min(ks)][0], 0.01)
        thr = r[max(ks)][1] / max(r[max(ks)][0], 0.01)
        lines.append(
            f"| {op} | "
            + " | ".join(f"{r[k][0]:.2f}s / {r[k][1]:,}" for k in ks)
            + f" | {wall_ratio:.1f}× | {thr:,.0f} |"
        )
    lines += [
        "",
        f"Relational core on lineitem ({n_li} rows × k; input-rows/s",
        "at k_max — the window op's out-rows track input, the agg's",
        "6-cell output is constant, so throughput is the honest axis",
        "for both):",
        "",
        "| op | " + " | ".join(f"k={k} wall" for k in ks) + " | wall × | in-rows/s @k_max |",
        "|---|" + "---|" * (len(ks) + 2),
    ]
    for op, r in fact_results.items():
        wall_ratio = r[max(ks)][0] / max(r[min(ks)][0], 0.01)
        thr = n_li * max(ks) / max(r[max(ks)][0], 0.01)
        lines.append(
            f"| {op} | "
            + " | ".join(f"{r[k][0]:.2f}s" for k in ks)
            + f" | {wall_ratio:.1f}× | {thr:,.0f} |"
        )
    lines += [
        "",
        f"Embedding moments ({n_emb} vectors × k, d=64; the Gram",
        "output is the CONSTANT d(d+1)/2+d+1 cell set, so wall-clock",
        "must track input linearly — one Arrow-batched X'X pass, only",
        "per-batch d² partials ever shuffle):",
        "",
        "| op | " + " | ".join(f"k={k} wall" for k in ks) + " | wall × | in-rows/s @k_max |",
        "|---|" + "---|" * (len(ks) + 2),
    ]
    for op, r in emb_results.items():
        wall_ratio = r[max(ks)][0] / max(r[min(ks)][0], 0.01)
        thr = n_emb * max(ks) / max(r[max(ks)][0], 0.01)
        lines.append(
            f"| {op} | "
            + " | ".join(f"{r[k][0]:.2f}s" for k in ks)
            + f" | {wall_ratio:.1f}× | {thr:,.0f} |"
        )
    # ------------------------------------------------------------------
    # round-3 additions: exact-substring dedup, DSIR, SemDeDup with
    # scale-derived k, batched BPE, unigram trainer, classifier GD.
    # Own k ladder (the quadratic-output / iterative ops are probed to
    # 64x, still adversarial: every interior window repeats k times).
    # ------------------------------------------------------------------
    from hadron_spark.llm.bpe import bpe_train
    from hadron_spark.llm.classifier import train_quality_classifier
    from hadron_spark.llm.dedup import repeated_spans, semantic_dedup
    from hadron_spark.llm.dsir import dsir_scores
    from hadron_spark.llm.unigram import unigram_train
    from hadron_spark.operators.ops import hash_bucket

    r3_ks = [int(x) for x in (
        sys.argv[3].split(",") if len(sys.argv) > 3 else ["4", "16", "64"]
    )]

    def probe_repeated_spans(d):
        return repeated_spans(d, window=8).count()

    def probe_dsir(d):
        target = d.filter(hash_bucket(F.col("doc_id"), 16) == 0)
        return dsir_scores(d, target, n_buckets=4096).count()

    def probe_bpe(d):
        st: dict = {}
        merges, _ = bpe_train(d, num_merges=64, merge_batch=16, stats=st)
        return len(merges) * 1000 + st["rounds"]  # encode rounds in out

    def probe_unigram(d):
        st: dict = {}
        pieces, _ = unigram_train(
            d, vocab_size=64, seed_size=256, max_piece_len=5, stats=st
        )
        return len(pieces) * 1000 + st["rounds"]

    def probe_classifier(d):
        lab = d.withColumn(
            "_y", (hash_bucket(F.col("doc_id"), 2) == 0).cast("int")
        )
        w = train_quality_classifier(lab, "_y", iters=8)
        return len(w)

    R3_DOC_OPS = {
        "repeated_spans_w8": probe_repeated_spans,
        "dsir_scores": probe_dsir,
        "bpe_train_64x16": probe_bpe,
        "unigram_train_v64": probe_unigram,
        "classifier_gd_8it": probe_classifier,
    }

    def probe_semantic(e):
        return (
            semantic_dedup(
                e,
                iters=2,
                threshold=0.99,
                target_cluster_rows=1000,
                max_cluster_size=10_000,
            )
            .filter("NOT keep")
            .count()
        )

    r3_doc_results: dict[str, dict[int, tuple[float, int]]] = {
        op: {} for op in R3_DOC_OPS
    }
    r3_emb_results: dict[int, tuple[float, int]] = {}
    for k in r3_ks:
        d = blow_up(base, k).repartition(32).localCheckpoint()
        for op, fn in R3_DOC_OPS.items():
            t0 = time.time()
            n_out = fn(d)
            r3_doc_results[op][k] = (round(time.time() - t0, 2), int(n_out))
        d.unpersist()
        em = blow_up_emb(emb_base, k)
        t0 = time.time()
        n_out = probe_semantic(em)
        r3_emb_results[k] = (round(time.time() - t0, 2), int(n_out))

    lines += [
        "",
        "## Round-3 ops (own k ladder — every interior window/replica",
        f"repeats k×, the adversarial direction; ks={r3_ks}):",
        "",
        "For the two tokenizer trainers the out cell encodes",
        "`pieces_or_merges*1000 + spark_rounds` — the claim under test",
        "is that ROUNDS stay constant as the corpus grows (the work is",
        "|vocab|-bounded after the wordcount pass), so wall should grow",
        "far slower than input. classifier_gd runs 8 full-batch",
        "gradient rounds — wall tracks the 8 corpus passes linearly.",
        "semantic_dedup uses the SCALE-DERIVED k (target 1000 rows per",
        "cluster), the round-2 verdict's no-silent-no-op contract.",
        "",
        "| op | "
        + " | ".join(f"k={k} wall / out" for k in r3_ks)
        + " | wall × |",
        "|---|" + "---|" * (len(r3_ks) + 1),
    ]
    for op, r in r3_doc_results.items():
        wall_ratio = r[max(r3_ks)][0] / max(r[min(r3_ks)][0], 0.01)
        lines.append(
            f"| {op} | "
            + " | ".join(f"{r[k][0]:.2f}s / {r[k][1]:,}" for k in r3_ks)
            + f" | {wall_ratio:.1f}× |"
        )
    wall_ratio = r3_emb_results[max(r3_ks)][0] / max(
        r3_emb_results[min(r3_ks)][0], 0.01
    )
    lines.append(
        f"| semantic_dedup (emb, derived k) | "
        + " | ".join(
            f"{r3_emb_results[k][0]:.2f}s / {r3_emb_results[k][1]:,}"
            for k in r3_ks
        )
        + f" | {wall_ratio:.1f}× |"
    )
    # ------------------------------------------------------------------
    # round-4-late additions: exact set-similarity join (prefix
    # filter under adversarial near-dup clusters — every replica of a
    # base doc pairs with every other at J >= 0.9, so output is
    # C(k,2) per base doc and the RATE is the honest axis), triangle
    # counting + coreness (k disjoint replicas of a fixed co-order
    # graph — wall must track edges ~linearly since the degree
    # distribution is constant), systematic PPS sampling and the
    # snapshot novelty diff (single-scan claims — wall linear).
    # ------------------------------------------------------------------
    from hadron_spark.llm.dedup import set_similarity_join
    from hadron_spark.llm.mixing import systematic_pps_sample
    from hadron_spark.llm.report import corpus_novelty
    from hadron_spark.operators.graph import coreness, node_triangle_counts

    r4_ks = r3_ks

    def probe_setsim(d):
        # every 10th BASE doc, all k replicas kept: cluster width (the
        # adversarial axis — C(k,2) pairs, k-wide prefix buckets)
        # still grows with k while the base breadth stays bounded
        thin = d.filter((F.col("doc_id") % 1_000_000_000) % 10 == 0)
        toks = thin.select(
            "doc_id", F.split(F.lower("text"), r"\s+").alias("tokens")
        )
        return set_similarity_join(
            toks, threshold_num=9, threshold_den=10
        ).count()

    def probe_pps(d):
        staged = d.select(
            "doc_id", F.size(F.split("text", r"\s+")).alias("w")
        )
        return systematic_pps_sample(staged, 1000, "w").count()

    def probe_novelty(d):
        old = d.filter(F.col("doc_id") % 3 != 0)
        return corpus_novelty(d, old, n=8).count()

    R4_DOC_OPS = {
        "set_similarity_j9/10": probe_setsim,
        "systematic_pps_1000": probe_pps,
        "corpus_novelty_w8": probe_novelty,
    }
    r4_doc_results: dict[str, dict[int, tuple[float, int]]] = {
        op: {} for op in R4_DOC_OPS
    }
    # fixed-density co-order graph (quarter of the part universe so
    # the k=1 copy is small), replicated disjointly
    li_small = li_base.filter(F.col("l_partkey") % 4 == 0).select(
        "l_orderkey", "l_partkey"
    ).distinct()
    g_edges = (
        li_small.alias("a")
        .join(li_small.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
        .localCheckpoint()
    )
    n_gedges = g_edges.count()

    def blow_up_graph(e, k: int):
        parts = [
            e.select(
                (F.col("src") + F.lit(r * 1_000_000_000)).alias("src"),
                (F.col("dst") + F.lit(r * 1_000_000_000)).alias("dst"),
            )
            for r in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    R4_GRAPH_OPS = {
        "node_triangle_counts": lambda e: node_triangle_counts(e).count(),
        "coreness_hindex": lambda e: coreness(e).count(),
    }
    r4_graph_results: dict[str, dict[int, tuple[float, int]]] = {
        op: {} for op in R4_GRAPH_OPS
    }
    for k in r4_ks:
        d = blow_up(base, k).repartition(32).localCheckpoint()
        for op, fn in R4_DOC_OPS.items():
            t0 = time.time()
            n_out = fn(d)
            r4_doc_results[op][k] = (round(time.time() - t0, 2), int(n_out))
        d.unpersist()
        ge = blow_up_graph(g_edges, k).repartition(32).localCheckpoint()
        for op, fn in R4_GRAPH_OPS.items():
            t0 = time.time()
            n_out = fn(ge)
            r4_graph_results[op][k] = (round(time.time() - t0, 2), int(n_out))
        ge.unpersist()

    lines += [
        "",
        "## Round-4-late ops (ks=" + str(r4_ks) + "; docs ladder as above,",
        f"graph ladder = k disjoint replicas of a {n_gedges:,}-edge",
        "co-order graph — constant degree distribution, so wall must",
        "track edges ~linearly; set-similarity output is C(k,2) pairs",
        "per base doc by construction — rate is the honest axis):",
        "",
        "| op | "
        + " | ".join(f"k={k} wall / out" for k in r4_ks)
        + " | wall × | out-rows/s @k_max |",
        "|---|" + "---|" * (len(r4_ks) + 2),
    ]
    for op, r in list(r4_doc_results.items()) + list(r4_graph_results.items()):
        wall_ratio = r[max(r4_ks)][0] / max(r[min(r4_ks)][0], 0.01)
        thr = r[max(r4_ks)][1] / max(r[max(r4_ks)][0], 0.01)
        lines.append(
            f"| {op} | "
            + " | ".join(f"{r[k][0]:.2f}s / {r[k][1]:,}" for k in r4_ks)
            + f" | {wall_ratio:.1f}× | {thr:,.0f} |"
        )

    lines.append("")
    open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"), "w").write("\n".join(lines))
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
