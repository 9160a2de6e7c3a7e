"""Sequence packing: concat-and-chunk a corpus into fixed-length
training sequences.

Pretraining dataloaders do not feed one document per sequence — they
concatenate the token stream of the whole (ordered) corpus and slice
it into fixed `seq_len` windows, so every sequence is exactly full
and documents straddle boundaries (GPT-2/3 style "packing"; the
EOS-joined variant differs only by +1 token per document, which the
caller can fold into the count expression). The reference engine has
no notion of this (SURVEY §2 stops at record-level transforms); for
an LLM-data engine it is the step that turns a cleaned corpus into
the actual shard layout a trainer consumes.

The whole computation is integer arithmetic over a global prefix sum
of per-document token counts — the one global-ordering primitive that
normally costs a single-partition window. Here it rides on
`ops.range_cumsum` (the range_rank banding trick): band by the order
key, driver-collect per-band sums, literal-array offsets, ONE hash
exchange. Everything downstream is a narrow `sequence()` explode —
a document overlapping k sequences emits k span rows — so the op is
a two-pass, one-shuffle plan at any corpus size, and every output
column is exact long arithmetic (bit-identical in any engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadron_spark.operators import ops


def chunk_text_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 256,
    overlap_tokens: int = 0,
) -> DataFrame:
    """Per-document sliding-window chunking in TOKEN units — the
    retrieval/RAG prep step (`pack_sequences` concatenates ACROSS
    documents for pretraining; `llm.textstats.chunk_text` is the
    CHARACTER-width variant; retrieval corpora need token-budgeted
    chunks that respect document boundaries, usually with overlap so
    no answer span is cut).

    Chunks start every `chunk_tokens − overlap_tokens` whitespace
    tokens; the last chunk is the remainder (shorter, never empty);
    a document with ≤ chunk_tokens tokens yields itself as one chunk;
    token-less documents emit NO rows (join semantics — filter
    upstream if the empty row matters).

    Plan: one narrow per-row `sequence()` explode over the token
    array — zero shuffle, all Catalyst (split/slice/concat_ws), and
    every output is exact integer arithmetic on token positions, so
    the whole op carries a FULL SQL oracle.  Returns (id_col,
    chunk_id, start_token, n_tokens, chunk) with `chunk` the
    re-joined text (single-space joined — the tokenizer's whitespace
    collapse, byte-lossless only for single-space corpora)."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens), got {overlap_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    from hadron_spark.functions.text import tokenize

    toks = df.select(
        F.col(id_col),
        tokenize(F.col(text_col)).alias("_toks"),
    ).withColumn("_n", F.size("_toks")).filter(F.col("_n") > 0)
    # chunk starts: 0, stride, 2·stride, …; chunk j ≥ 1 exists iff the
    # previous one stopped short of the end ((j−1)·stride + chunk < n),
    # so n_chunks = 1 + ceil((n − chunk)/stride) for n > chunk, else 1
    # — stated in INTEGER div (ceil(a/b) = (a−1) div b + 1) so the
    # oracle mirrors without any float ceil
    n_chunks = F.when(
        F.col("_n") <= chunk_tokens, F.lit(1)
    ).otherwise(
        F.expr(f"2 + ((_n - {chunk_tokens} - 1) div {stride})").cast("int")
    )
    out = toks.withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))
    ).select(
        id_col,
        "chunk_id",
        (F.col("chunk_id") * stride).alias("start_token"),
        F.least(
            F.lit(chunk_tokens), F.col("_n") - F.col("chunk_id") * stride
        ).alias("n_tokens"),
        F.concat_ws(
            " ",
            F.slice(
                F.col("_toks"),
                F.col("chunk_id") * stride + 1,
                F.lit(chunk_tokens),
            ),
        ).alias("chunk"),
    )
    return out


def pack_sequences(
    df: DataFrame,
    id_col: str,
    count: Column,
    seq_len: int,
    buckets: int | None = None,
) -> DataFrame:
    """Assign every document its span(s) in the packed fixed-length
    sequence space.

    The corpus is ordered by `id_col` (must be numeric and unique —
    the curriculum order; run `ops.ordered_export` first for a
    different order and pack on its rank). `count` is the per-row
    token count expression (e.g. `text.token_count(...)`; add +1 for
    an EOS separator if the trainer inserts one). Zero-token rows
    participate in nothing but keep their neighbors' offsets stable.

    Output, one row per (document × overlapped sequence):
      seq_id       — 0-based fixed-length sequence index
      <id_col>     — the document
      begin_in_seq / end_in_seq — the doc's half-open token span
                     within this sequence (0 ≤ b < e ≤ seq_len)
      doc_offset   — where this span starts inside the document
      n_tok        — span length = end_in_seq - begin_in_seq

    Scale shape: one exchange (the banded prefix sum), then a narrow
    explode whose fan-out is ceil(n_tok/seq_len)+1 per row — bounded
    by document length, never by corpus size."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    base = df.select(F.col(id_col), count.cast("long").alias("_n"))
    cum = ops.range_cumsum(
        base,
        key=F.col(id_col),
        val=F.col("_n"),
        order=[F.col(id_col)],
        out_col="_b",
        buckets=buckets,
    )
    sl = int(seq_len)
    L = F.lit(sl).cast("long")
    b, e = F.col("_b"), F.col("_b") + F.col("_n")
    # `div` is exact long floor-division (never the double-rounding
    # of `/` — offsets at 100 TB of tokens brush against 2^53)
    spans = (
        cum.filter(F.col("_n") > 0)
        .withColumn("_e", e)
        .withColumn(
            "seq_id",
            F.explode(F.sequence(F.expr(f"_b div {sl}"), F.expr(f"(_e - 1) div {sl}"))),
        )
        .withColumn("seq_id", F.col("seq_id").cast("long"))
    )
    lo = F.col("seq_id") * L
    hi = lo + L
    return spans.select(
        "seq_id",
        id_col,
        (F.greatest(b, lo) - lo).cast("long").alias("begin_in_seq"),
        (F.least(e, hi) - lo).cast("long").alias("end_in_seq"),
        F.greatest(F.lit(0).cast("long"), lo - b).alias("doc_offset"),
        (F.least(e, hi) - F.greatest(b, lo)).cast("long").alias("n_tok"),
    )


def pack_sequences_grouped(
    df: DataFrame,
    group_col: str,
    id_col: str,
    count: Column,
    seq_len: int,
) -> DataFrame:
    """Per-GROUP packing: documents pack into fixed-length sequences
    WITHIN each group (a data source, a curriculum stage, a length
    bucket) — sequences never mix groups, the knob that kills
    cross-domain contamination inside a training sequence and, with
    length-bucket groups, most padding.

    Same output contract as `pack_sequences` plus `group_col`;
    `seq_id` is 0-based PER GROUP.  Offsets come from a prefix sum
    windowed by the group (exclusive: sum of strictly-prior docs in
    (id) order) — partitioned, parallel across groups, no
    single-partition funnel.  One giant group degrades to one task's
    sort: for that shape use the global banded `pack_sequences` and
    slice afterward."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    from pyspark.sql import Window as _W

    base = df.select(
        F.col(group_col), F.col(id_col), count.cast("long").alias("_n")
    )
    w = (
        _W.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(_W.unboundedPreceding, -1)
    )
    cum = base.withColumn(
        "_b", F.coalesce(F.sum("_n").over(w), F.lit(0)).cast("long")
    )
    sl = int(seq_len)
    L = F.lit(sl).cast("long")
    b, e = F.col("_b"), F.col("_b") + F.col("_n")
    spans = (
        cum.filter(F.col("_n") > 0)
        .withColumn("_e", e)
        .withColumn(
            "seq_id",
            F.explode(
                F.sequence(
                    F.expr(f"_b div {sl}"), F.expr(f"(_e - 1) div {sl}")
                )
            ),
        )
        .withColumn("seq_id", F.col("seq_id").cast("long"))
    )
    lo = F.col("seq_id") * L
    hi = lo + L
    return spans.select(
        group_col,
        "seq_id",
        id_col,
        (F.greatest(b, lo) - lo).cast("long").alias("begin_in_seq"),
        (F.least(e, hi) - lo).cast("long").alias("end_in_seq"),
        F.greatest(F.lit(0).cast("long"), lo - b).alias("doc_offset"),
        (F.least(e, hi) - F.greatest(b, lo)).cast("long").alias("n_tok"),
    )


def packing_stats(packed: DataFrame) -> DataFrame:
    """Per-sequence fill accounting over `pack_sequences` output:
    how many documents touch each sequence and how full it is (only
    the final sequence of the corpus can be short). Narrow groupBy
    on seq_id — one partial-agg'd exchange over the span table."""
    return packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("fill_tokens"),
        F.min("begin_in_seq").alias("first_begin"),
        F.max("end_in_seq").alias("last_end"),
    )


def write_packed_shards(
    packed: DataFrame,
    out_dir: str,
    seqs_per_shard: int = 1024,
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize `pack_sequences` output as the shard layout a
    trainer consumes: shard s holds sequences [s·S, (s+1)·S), each
    file internally sorted by (seq_id, begin_in_seq) so a dataloader
    streams spans in token order with zero sorting on its side.

    One shuffle (the repartition into shards — keyed by a pure
    function of seq_id, so shard placement is reproducible), sorted
    streaming write per shard. Returns the manifest
    (shard, n_spans, min_seq, max_seq) assembled from the committed
    parquet FOOTERS — pure metadata, no read-back (the
    fan_out_write/ordered_export discipline)."""
    from hadron_spark.operators.ops import _band_manifest

    S = int(seqs_per_shard)
    if S <= 0:
        raise ValueError(f"seqs_per_shard must be positive, got {S}")
    sharded = packed.withColumn(
        "_shard", F.expr(f"seq_id div {S}").cast("int")
    )
    (
        sharded.repartition(F.col("_shard"))
        .sortWithinPartitions("_shard", "seq_id", "begin_in_seq")
        .write.mode(mode)
        .partitionBy("_shard")
        .parquet(out_dir)
    )
    manifest = _band_manifest(packed.sparkSession, out_dir, "_shard", "seq_id")
    return manifest.select(
        F.col("band").alias("shard"),
        F.col("n_rows").alias("n_spans"),
        F.col("min_key").alias("min_seq"),
        F.col("max_key").alias("max_seq"),
    )


def event_sequences(
    df: DataFrame,
    key_col: str,
    order_cols: list,
    value_col: str,
    seq_col: str = "seq",
    sep: str = ">",
) -> DataFrame:
    """Trajectory assembly: per-key ordered event sequences — the
    log→sequence-dataset step of behavioral-model training (next-event
    prediction, session2vec, RL-from-logs).

    Output: (key_col, n_events, seq_col) with the sequence joined to
    one string by `sep` (string output is hash-portable across
    engines; split downstream if arrays are wanted).

    Determinism: events sort by `order_cols` INSIDE the aggregated
    array (array_sort over (order..., value) structs — lexicographic
    struct order), so `order_cols` must be a total order per key
    (include a unique id as the final tiebreak).  Plan: ONE
    partial-agg'd groupBy on the key; no window, no global sort."""
    ordering = [F.col(c) for c in order_cols]
    packed = F.array_sort(
        F.collect_list(F.struct(*ordering, F.col(value_col).alias("_v")))
    )
    return (
        df.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(packed, lambda s: s["_v"]), sep
            ).alias(seq_col),
        )
    )


def chat_examples(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "content",
    mask_roles: tuple = ("assistant",),
) -> DataFrame:
    """Instruction-tuning example assembly: turn rows → one rendered
    conversation string per dialog PLUS the per-turn character spans
    a trainer needs to build the loss mask (SFT convention: loss only
    on the roles in `mask_roles`, i.e. the assistant's tokens; the
    prompt/user/system tokens are context, not targets).

    Template (ChatML-shaped, public convention):
        <|role|>\\ncontent\\n  per turn, concatenated in turn order.

    Output: (conv_col, n_turns, text, spans) where spans is
    array<struct<turn, role, span_start, span_end, loss>> — char
    offsets [span_start, span_end) of each turn's CONTENT inside
    `text` (0-indexed), so substring(text, span_start+1,
    span_end-span_start) == content by construction, and the trainer
    maps char spans to token spans after tokenization.

    Plan shape: ONE partial-agg'd groupBy on the conversation key —
    turns sort INSIDE the aggregated array (array_sort over
    (order, role, content) structs; `order_col` must totally order a
    dialog), offsets are a SINGLE in-row pass (aggregate building the
    start-offset array — int-only accumulator, no O(k²) re-slicing),
    and every offset is exact integer character arithmetic —
    bit-identical in any engine. No window, no second shuffle; dialogs
    parallelize across the conversation key at any corpus size."""
    ts = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(order_col).alias("_o"),
                F.col(role_col).alias("_r"),
                F.col(content_col).alias("_c"),
            )
        )
    )
    agged = turns.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_turns"), ts.alias("_ts")
    )
    # piece = '<|' role '|>\n' content '\n'  → len = 6 + |role| + |content|
    # single forward pass: array of piece START offsets (ints only, so
    # the aggregate's initial value needs no exotic type annotation)
    starts = F.expr(
        "aggregate(_ts, named_struct('off', 0, 'st', cast(array() as array<int>)), "
        "(acc, t) -> named_struct("
        "'off', acc.off + 6 + length(t._r) + length(t._c), "
        "'st', array_append(acc.st, acc.off)), "
        "acc -> acc.st)"
    )
    # projection boundary: _ts and _starts are both multi-referenced
    staged = agged.select(
        conv_col, "n_turns", "_ts", starts.alias("_starts")
    )
    mask_arr = F.array(*[F.lit(r) for r in mask_roles])
    spans = F.transform(
        F.col("_ts"),
        lambda t, i: F.struct(
            t["_o"].alias("turn"),
            t["_r"].alias("role"),
            (F.element_at(F.col("_starts"), i + 1) + 5 + F.length(t["_r"]))
            .cast("int")
            .alias("span_start"),
            (
                F.element_at(F.col("_starts"), i + 1)
                + 5
                + F.length(t["_r"])
                + F.length(t["_c"])
            )
            .cast("int")
            .alias("span_end"),
            F.array_contains(mask_arr, t["_r"]).alias("loss"),
        ),
    )
    text = F.array_join(
        F.transform(
            F.col("_ts"),
            lambda t: F.concat(
                F.lit("<|"), t["_r"], F.lit("|>\n"), t["_c"], F.lit("\n")
            ),
        ),
        "",
    )
    return staged.select(
        conv_col, "n_turns", text.alias("text"), spans.alias("spans")
    )


def preference_pairs(
    responses: DataFrame,
    group_col: str = "prompt_id",
    id_col: str = "response_id",
    text_col: str = "response",
    score_col: str = "score",
    min_margin=0,
) -> DataFrame:
    """Preference-pair assembly for DPO/RLHF reward training: from a
    table of scored candidate responses per prompt, emit one
    (chosen, rejected) pair per prompt — chosen = highest-scored
    response, rejected = lowest-scored — and drop prompts whose
    score gap is under `min_margin` (near-tied pairs teach the
    reward model noise; the margin gate is the standard filter).
    This is the pairwise complement of `chat_examples`' SFT
    assembly: same upstream response tables, pairwise output.

    Determinism: argmax/argmin are lexicographic struct extrema over
    (score, id, text) — equal scores break to the higher (chosen) /
    lower (rejected) response id, mirrored exactly by a struct-max
    in portable SQL, so the op is oracle-hashable end to end when
    scores are stored data or exact integers.

    Plan shape: ONE partial-agg'd groupBy on the prompt key — both
    extrema and the count reduce map-side, response text rides
    inside the extremum structs (no re-join back to fetch it), and
    prompts parallelize across the key at any corpus size.  Skew is
    bounded by annotation practice (responses per prompt is small by
    construction).  Prompts with a single response produce no pair
    (chosen and rejected must be distinct rows).

    Returns (group_col, chosen_id, chosen, rejected_id, rejected,
    n_candidates)."""
    s = responses.select(
        F.col(group_col),
        F.struct(
            F.col(score_col).alias("s"),
            F.col(id_col).alias("i"),
            F.col(text_col).alias("t"),
        ).alias("__sit"),
    )
    agg = s.groupBy(group_col).agg(
        F.max("__sit").alias("__hi"),
        F.min("__sit").alias("__lo"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    return (
        agg.filter(F.col("__hi.i") != F.col("__lo.i"))
        .filter(F.col("__hi.s") - F.col("__lo.s") >= F.lit(min_margin))
        .select(
            group_col,
            F.col("__hi.i").alias("chosen_id"),
            F.col("__hi.t").alias("chosen"),
            F.col("__lo.i").alias("rejected_id"),
            F.col("__lo.t").alias("rejected"),
            "n_candidates",
        )
    )
