"""CCNet-style n-gram LM perplexity filtering (Wenzek et al. 2020,
arXiv:1911.00359): score every document by a reference-corpus n-gram
language model and cut by perplexity band — the classic pretraining
quality stage (CCNet trains KenLM on Wikipedia, keeps the
low-perplexity head/middle of Common Crawl).

Re-expressed Spark-first with STUPID BACKOFF (Brants et al. 2007,
"Large Language Models in Machine Translation" — the web-scale
backoff designed exactly for distributed count-based LMs: no
discount bookkeeping, score S(w|ctx) = count(ngram)/count(ctx) when
the n-gram was seen, else alpha * S(w|shorter ctx)):

1. TRAIN (`ngram_lm_train`) — one tokenize+explode pass over the
   REFERENCE corpus counting grams of every order 1..N tagged
   in-row (single wordcount-shaped shuffle).  Two key modes:
   - hashed (`n_buckets` set): grams crc32-bucket per order — the
     model is (N x n_buckets)-bounded regardless of reference size
     (the `dsir.hashed_ngram_features` discipline; collisions are
     part of the model, Weinberger et al. 2009).
   - exact (`n_buckets=None`): literal gram strings — vocab-bounded;
     right for the small high-quality reference CCNet prescribes,
     and DuckDB-mirrorable so the registry carries FULL oracles for
     the counts and the integer backoff decisions.
2. SCORE (`perplexity_scores`) — one in-row pass over the target
   corpus builds, per token position p, the gram/context keys of
   every order (array expressions, no window), explodes positions,
   and resolves stupid backoff with 2N-1 BROADCAST joins against
   the order-sliced count table: use the LONGEST order n with a
   seen gram, logS = ln(c_gram/c_ctx) + (min(N,p)-n)*ln(alpha);
   the order-1 floor is add-one smoothed  ln((c+1)/(T+V+1))  so
   OOV tokens score finitely.  The only shuffle is the final
   per-doc aggregation (partial-agg'd mean log-prob).
3. CUT (`perplexity_band`) — percentile_disc thresholds over the
   per-doc log-prob (actual elements, deterministic), keep the
   [lo, hi) band — CCNet's head/middle/tail cut.

Positions with p < n simply attempt their longest available order
(no BOS padding — the backoff chain absorbs short history, and the
scored-token count stays equal to the token count).

Oracle discipline: ln() is not cross-engine bit-stable, so the
log-prob/perplexity registry entries are rows-only (the
`dsir`/`classifier` rule); but the BACKOFF DECISIONS are pure
integers — `backoff_summary` emits per-doc (positions, chosen-order
sum, numerator-count sum, denominator-count sum) which the registry
oracles bit-exactly in exact mode, and ln-parity is pinned against
a pure-Python reference in test_perplexity.

Scale: the model table is n_buckets-bounded (broadcast, like the
DSIR ratio table — a 2^20-bucket trigram model is ~tens of MB);
the target corpus is tokenized once, exploded to token-scale rows
carrying only hashed longs (hashed mode), reduced by the one
per-doc exchange.  Reference-corpus size only affects the one
training wordcount.  No counterpart in the reference repo (the
LLM-curation tier is beyond-reference scope; cf. VERDICT r3 #1).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadron_spark.functions.text import tokenize

_ALPHA = 0.4  # Brants et al. 2007's backoff constant


@dataclass
class NgramLM:
    """Trained stupid-backoff model: the count table plus the two
    driver scalars scoring needs (the kmeans-centroid contract —
    model state, not data, rides the driver)."""

    counts: DataFrame  # (n int, gram string | bucket long, cnt long)
    total_tokens: int  # T — order-1 denominator
    vocab: int  # V — distinct order-1 keys (add-one floor width)
    order: int
    n_buckets: int | None  # None = exact gram strings
    alpha: float = field(default=_ALPHA)

    @property
    def key_col(self) -> str:
        return "bucket" if self.n_buckets is not None else "gram"


def _gram_key(gram_str, n_buckets: int | None):
    """Gram string -> join key: crc32 bucket (hashed mode) or the
    string itself.  Python mirror: zlib.crc32(g.encode()) % B."""
    if n_buckets is None:
        return gram_str
    return F.crc32(gram_str.cast("binary")) % n_buckets


def ngram_lm_train(
    ref_df: DataFrame,
    text_col: str = "text",
    order: int = 3,
    n_buckets: int | None = None,
    alpha: float = _ALPHA,
) -> NgramLM:
    """Count grams of orders 1..`order` over the reference corpus in
    ONE tokenize+explode pass (orders tagged in-row, single
    wordcount shuffle), then collect the two scalars (total tokens,
    order-1 vocab width) the scorer's smoothing floor needs."""
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha!r}")
    from hadron_spark.operators.ops import pin

    # projection boundary: evaluate tokenize once per row (see
    # _position_frame — per-order references would re-split)
    base = ref_df.select(tokenize(F.col(text_col)).alias("__toks"))

    # posexplode positions FIRST, then derive every order's gram key
    # as a plain codegen projection — the previous shape (per-order
    # transform lambdas tagged in-row, one explode of the concat)
    # evaluated the gram expressions through the interpreted HOF
    # lambda path inside GenerateExec; same gram multiset, measured
    # 3x slower (guide §4.1: built-ins over interpreted lambdas).
    # Grams of order n ending at 1-based position p exist when
    # p >= n — exactly the len-n+1 grams per document the tagged
    # shape produced.
    pe = base.select(
        "__toks", F.posexplode(F.col("__toks")).alias("_i", "_t")
    )
    p = F.col("_i") + 1
    xtoks = F.col("__toks")

    def key_at(n):
        s = F.concat_ws(" ", F.slice(xtoks, p - n + 1, n))
        return F.when(p >= n, _gram_key(s, n_buckets))

    key_name = "bucket" if n_buckets is not None else "gram"
    stacked = pe.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("n"), key_at(n).alias("k")
                    )
                    for n in range(1, order + 1)
                ]
            )
        ).alias("t")
    ).select(F.col("t.n").alias("n"), F.col("t.k").alias(key_name))
    counts = (
        stacked.filter(F.col(key_name).isNotNull())
        .groupBy("n", key_name)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    counts = pin(counts)  # feeds the scalar jobs AND every score join
    uni = counts.filter(F.col("n") == 1).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("t"),
        F.count(F.lit(1)).alias("v"),
    ).first()
    return NgramLM(
        counts=counts,
        total_tokens=int(uni["t"]),
        vocab=int(uni["v"]),
        order=order,
        n_buckets=n_buckets,
        alpha=alpha,
    )


def _position_frame(
    df: DataFrame, lm: NgramLM, id_col: str, text_col: str
) -> DataFrame:
    """(id, p, ord_used, num, den, n_avail) — one row per token
    position with the stupid-backoff decision resolved: the longest
    order whose gram (and context) the model saw, its integer
    count ratio, and the orders attempted.  All the ln-free state;
    both the float scorer and the integer oracle summary derive
    from this frame.

    Shape: posexplode the token array, then derive every order's
    gram/context key as a plain codegen projection over the carried
    array (the posexplode+project pair fuses into one codegen span,
    so the array is referenced, not copied, per position), then
    2N-1 broadcast joins against the order-sliced model and a
    when-chain.  Hashed mode joins on longs, not gram strings.  The
    token array is materialized behind a PROJECTION boundary first
    (the repeated_spans pattern): inlining tokenize() into the
    position expressions makes Catalyst re-split the text once per
    slice reference per position — measured 12s vs <2s on 270k
    positions at sf0.1.  An earlier shape built the keys inside a
    transform() lambda and exploded the struct array — same values,
    but GenerateExec evaluates HOF lambdas interpreted, measured 3x
    slower than this codegen projection (optimization r07)."""
    N, B = lm.order, lm.n_buckets
    base = df.select(
        F.col(id_col).alias("_id"), tokenize(F.col(text_col)).alias("__toks")
    )
    pe = base.select(
        "_id", "__toks", F.posexplode(F.col("__toks")).alias("_i", "_t")
    )
    pcol = F.col("_i") + 1
    xtoks = F.col("__toks")

    def key_at(p, n):
        # gram of order n ending at 1-based position p (NULL if p<n)
        s = F.concat_ws(" ", F.slice(xtoks, p - n + 1, n))
        return F.when(p >= n, _gram_key(s, B))

    pos = pe.select(
        "_id",
        pcol.cast("int").alias("p"),
        *[key_at(pcol, n).alias(f"g{n}") for n in range(1, N + 1)],
        # context of order-n gram ending at p = (n-1)-gram at p-1
        *[key_at(pcol - 1, n - 1).alias(f"x{n}") for n in range(2, N + 1)],
    )

    key = lm.key_col
    for n in range(1, N + 1):
        cn = lm.counts.filter(F.col("n") == n).select(
            F.col(key).alias(f"g{n}"), F.col("cnt").alias(f"c{n}")
        )
        pos = pos.join(F.broadcast(cn), f"g{n}", "left")
    for n in range(2, N + 1):
        xn = lm.counts.filter(F.col("n") == n - 1).select(
            F.col(key).alias(f"x{n}"), F.col("cnt").alias(f"cx{n}")
        )
        pos = pos.join(F.broadcast(xn), f"x{n}", "left")

    # longest seen order wins; order-1 add-one floor always resolves
    ord_used = F.lit(1)
    num = F.coalesce(F.col("c1"), F.lit(0)) + 1
    den = F.lit(lm.total_tokens + lm.vocab + 1)
    for n in range(2, N + 1):
        seen = (
            (F.col("p") >= n)
            & F.col(f"c{n}").isNotNull()
            & F.col(f"cx{n}").isNotNull()
        )
        ord_used = F.when(seen, F.lit(n)).otherwise(ord_used)
        num = F.when(seen, F.col(f"c{n}")).otherwise(num)
        den = F.when(seen, F.col(f"cx{n}")).otherwise(den)
    return pos.select(
        F.col("_id").alias(id_col),
        "p",
        ord_used.alias("ord_used"),
        num.cast("long").alias("num"),
        den.cast("long").alias("den"),
        F.least(F.lit(N), F.col("p")).alias("n_avail"),
    )


def perplexity_scores(
    df: DataFrame,
    lm: NgramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, logprob_per_token, perplexity) — per-document
    mean stupid-backoff log-prob and its perplexity
    exp(-mean logprob).  Documents with no tokens are absent (no
    positions to score — filter them upstream with the Gopher
    rules if they must be decided)."""
    pos = _position_frame(df, lm, id_col, text_col)
    logp = (
        F.log(F.col("num").cast("double"))
        - F.log(F.col("den").cast("double"))
        + (F.col("n_avail") - F.col("ord_used")).cast("double")
        * F.lit(math.log(lm.alpha))
    )
    return (
        pos.select(id_col, logp.alias("_lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("_lp").alias("logprob_per_token"),
        )
        .withColumn("perplexity", F.exp(-F.col("logprob_per_token")))
    )


def backoff_summary(
    df: DataFrame,
    lm: NgramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, sum_order, sum_num, sum_den) — the integer
    skeleton of the perplexity score: how many positions, which
    backoff orders were chosen, and the exact count ratios summed.
    Pure-integer (no ln), so in exact mode this is bit-oracle-able
    in DuckDB — the correctness gate for the backoff resolution
    that the float score then merely takes logs of."""
    pos = _position_frame(df, lm, id_col, text_col)
    return pos.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("ord_used").alias("sum_order"),
        F.sum("num").alias("sum_num"),
        F.sum("den").alias("sum_den"),
    )


def perplexity_band(
    df: DataFrame,
    lm: NgramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_lo: float = 0.0,
    keep_hi: float = 2 / 3,
) -> DataFrame:
    """CCNet's band cut: rank documents by perplexity and keep the
    [keep_lo, keep_hi) quantile band — the default keeps the
    head+middle thirds (lowest-perplexity two-thirds), CCNet's
    standard training slice.

    Thresholds are percentile_disc over the per-doc log-prob
    (ACTUAL elements — deterministic under any partitioning, the
    corpus_report discipline; low perplexity == high log-prob).
    Band membership is  logprob > disc(1-keep_hi)  (strict: the
    dropped tail INCLUDES its boundary element) and
    logprob <= disc(1-keep_lo)  (the kept head includes its
    boundary element); ties share a value, so tied documents are
    always kept or dropped together.  Two collected scalars; the
    filter re-uses the pinned scored frame."""
    if not 0.0 <= keep_lo < keep_hi <= 1.0:
        raise ValueError(f"need 0 <= keep_lo < keep_hi <= 1: {keep_lo}, {keep_hi}")
    from hadron_spark.operators.ops import pin

    scored = pin(perplexity_scores(df, lm, id_col, text_col))
    q = scored.agg(
        F.expr(
            f"percentile_disc({1.0 - keep_hi}) WITHIN GROUP "
            "(ORDER BY logprob_per_token)"
        ).alias("lo"),
        F.expr(
            f"percentile_disc({1.0 - keep_lo}) WITHIN GROUP "
            "(ORDER BY logprob_per_token)"
        ).alias("hi"),
    ).first()
    out = scored
    if keep_hi < 1.0:
        out = out.filter(F.col("logprob_per_token") > q["lo"])
    if keep_lo > 0.0:
        out = out.filter(F.col("logprob_per_token") <= q["hi"])
    return out


def save_lm(lm: NgramLM, path: str) -> None:
    """Persist a trained LM as parquet: the count table plus ONE
    meta row (n = -1) carrying (total_tokens, vocab, order,
    n_buckets, alpha) in its cnt-adjacent columns — a single
    self-describing artifact, no sidecar file (the save_merges
    checkpoint discipline).  Hashed and exact modes both round-trip;
    `load_lm` restores an NgramLM that scores identically."""
    spark = lm.counts.sparkSession
    key = lm.key_col
    counts = lm.counts.select(
        "n",
        F.col(key).cast("string").alias("k"),
        F.col("cnt").cast("long").alias("cnt"),
        F.lit(None).cast("double").alias("meta_alpha"),
    )
    meta = spark.createDataFrame(
        [
            (
                -1,
                "hashed" if lm.n_buckets is not None else "exact",
                # total_tokens/vocab/order/n_buckets packed in cnt-width
                lm.total_tokens,
                float(lm.alpha),
            )
        ],
        "n int, k string, cnt long, meta_alpha double",
    ).withColumn("cnt", F.col("cnt"))
    extra = spark.createDataFrame(
        [
            (-2, "vocab", lm.vocab, None),
            (-3, "order", lm.order, None),
            (-4, "n_buckets", lm.n_buckets if lm.n_buckets is not None else -1, None),
        ],
        "n int, k string, cnt long, meta_alpha double",
    )
    counts.unionByName(meta).unionByName(extra).write.mode(
        "overwrite"
    ).parquet(path)


def load_lm(spark, path: str) -> NgramLM:
    """Restore a `save_lm` checkpoint.  The count table stays a
    DataFrame (pinned — it feeds every score join); the meta rows
    become the driver scalars."""
    from hadron_spark.operators.ops import pin

    raw = pin(spark.read.parquet(path))
    meta = {r["n"]: r for r in raw.filter(F.col("n") < 0).collect()}
    hashed = meta[-1]["k"] == "hashed"
    n_buckets = int(meta[-4]["cnt"])
    key = "bucket" if hashed else "gram"
    counts = raw.filter(F.col("n") >= 1).select(
        "n",
        (
            F.col("k").cast("long") if hashed else F.col("k")
        ).alias(key),
        "cnt",
    )
    return NgramLM(
        counts=counts,
        total_tokens=int(meta[-1]["cnt"]),
        vocab=int(meta[-2]["cnt"]),
        order=int(meta[-3]["cnt"]),
        n_buckets=n_buckets if n_buckets >= 0 else None,
        alpha=float(meta[-1]["meta_alpha"]),
    )
