"""Tokenizer shop floor — the three tokenizer families end to end on
one corpus: train a BPE merge list, encode with it, encode the same
corpus against a fixed WordPiece vocab (the published-model case),
compare the token economies, then pack the chosen token counts into
fixed-length training sequences.

Run: python examples/tokenize_corpus.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.llm.bpe import bpe_encode_table, bpe_train, bpe_train_to_vocab
from hadron_spark.llm.packing import chunk_text_tokens, pack_sequences, packing_stats
from hadron_spark.llm.wordpiece import wordpiece_encode
from hadron_spark.queries import _WP_VOCAB
from hadron_spark.sources.taps import Tap


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("tokenize_corpus_example")

    docs = Tap([f"{sf_dir}/documents.parquet"], "parquet").read(spark).select(
        "doc_id", "text"
    )
    n_docs = docs.count()

    merges, _vocab = bpe_train(docs, num_merges=128, merge_batch="adaptive")
    print(f"[1] BPE: trained {len(merges)} merges on {n_docs} docs")

    table = bpe_encode_table(docs, merges)
    bpe_tok = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .join(table.select("word", F.size("toks").alias("k")), "word")
        .groupBy("doc_id")
        .agg(F.sum("k").alias("bpe_tokens"))
    )

    wp = wordpiece_encode(docs, "text", _WP_VOCAB).select(
        "doc_id", F.col("n_tokens").alias("wp_tokens")
    )
    cmp = bpe_tok.join(wp, "doc_id")
    stats = cmp.agg(
        F.sum("bpe_tokens").alias("bpe"),
        F.sum("wp_tokens").alias("wp"),
    ).collect()[0]
    print(
        f"[2] token economy: BPE-128 {stats['bpe']:,} tokens vs "
        f"fixed WordPiece vocab {stats['wp']:,} tokens"
    )

    packed = pack_sequences(
        cmp.select("doc_id", "bpe_tokens"),
        "doc_id",
        F.col("bpe_tokens") + 1,  # +1 EOS per doc
        seq_len=512,
    )
    ps = packing_stats(packed)
    agg = ps.agg(
        F.count(F.lit(1)).alias("n_seq"),
        F.sum("fill_tokens").alias("fill"),
        F.sum(F.lit(512)).alias("cap"),
    ).collect()[0]
    print(
        f"[3] packed into {agg['n_seq']} sequences of 512 "
        f"(fill {agg['fill'] / agg['cap']:.3f}, {packed.count()} spans)"
    )

    # byte-level BPE: the production GPT-family mode — no [UNK]
    # reachable, any input round-trips through unhex
    bmerges, bpieces, _ = bpe_train_to_vocab(
        docs, vocab_size=256 + 64, mode="byte"
    )
    benc = bpe_encode_table(docs, bmerges, mode="byte")
    ok = benc.withColumn(
        "rt",
        F.decode(F.unhex(F.concat_ws("", "toks")), "UTF-8") == F.col("word"),
    ).agg(
        F.sum(F.when(F.col("rt"), 1).otherwise(0)).alias("ok"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    print(
        f"[4] byte-level BPE: {len(bmerges)} merges over the 256-byte "
        f"alphabet ({len(bpieces)} pieces); lossless round-trip "
        f"{ok['ok']}/{ok['n']} distinct words"
    )

    # retrieval prep: sliding-window chunks with overlap (boundaries
    # respected — pack_sequences above is the cross-document packer)
    ch = chunk_text_tokens(docs, chunk_tokens=32, overlap_tokens=8)
    cagg = ch.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.avg("n_tokens").alias("avg_tokens"),
    ).collect()[0]
    print(
        f"[5] RAG chunks: {cagg['n_chunks']} windows of <=32 tokens "
        f"(stride 24, avg {cagg['avg_tokens']:.1f} tokens)"
    )

    spark.stop()
    print("tokenize corpus done")


if __name__ == "__main__":
    main()
