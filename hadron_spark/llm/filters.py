"""Rule-based document quality filtering — the cleaning stage of a
web-scale training-data pipeline (C4/Gopher-style heuristics; rules
per Raffel et al. 2020 and Rae et al. 2021, both public).

Every rule is a pure Catalyst expression over the text column (no
Python in the loop): the filter runs inside whole-stage codegen and
the common case (keep) never leaves the scan stage — at 100 TB this
stage is scan-bound, which is the best it can be.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadron_spark.functions.text import STOPWORDS, tokenize
from hadron_spark.functions.text import ngrams as _ngrams


def quality_rules(
    text_col: Column | str = "text",
    min_chars: int = 50,
    max_chars: int = 100_000,
    min_stopword_hits: int = 2,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
    _toks: Column | None = None,
) -> dict[str, Column]:
    """name → violation predicate (True = document breaks the rule).
    Thresholds follow the published heuristics; all tunable.
    `_toks`: pass a PRE-PROJECTED token-array column to evaluate
    tokenize() once per row instead of once per reference (the
    language_id/perplexity projection-boundary lesson — the df-level
    wrappers below do this automatically)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = _toks if _toks is not None else tokenize(c)
    n_tok = F.size(toks)
    lower = F.transform(toks, lambda t: F.lower(t))
    stop_hits = F.size(F.filter(lower, lambda t: t.isin(STOPWORDS)))
    total_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    mean_len = total_chars.cast("double") / F.greatest(n_tok, F.lit(1))
    symbolish = F.size(
        F.filter(toks, lambda t: t.startswith("#") | t.startswith("@"))
    )
    return {
        "too_short": F.length(c) < min_chars,
        "too_long": F.length(c) > max_chars,
        "low_stopword": stop_hits < min_stopword_hits,
        "word_len_out_of_range": (mean_len < min_mean_word_len)
        | (mean_len > max_mean_word_len),
        "high_symbol_ratio": symbolish.cast("double")
        / F.greatest(n_tok, F.lit(1))
        > max_symbol_ratio,
    }


def apply_quality_filter(
    df: DataFrame, text_col: str = "text", **thresholds
) -> DataFrame:
    """Append `keep: boolean` and `drop_reasons: array<string>` (empty
    when kept). Downstream keeps with `.filter("keep")` — a narrow,
    pushdown-friendly predicate."""
    df = df.withColumn("__qr_toks", tokenize(F.col(text_col)))
    rules = quality_rules(text_col, _toks=F.col("__qr_toks"), **thresholds)
    reasons = F.filter(
        F.array(
            *[F.when(pred, F.lit(name)) for name, pred in rules.items()]
        ),
        lambda r: r.isNotNull(),
    )
    out = df.withColumn("drop_reasons", reasons).drop("__qr_toks")
    return out.withColumn("keep", F.size("drop_reasons") == 0)


def rule_violation_counts(df: DataFrame, text_col: str = "text", **thresholds) -> DataFrame:
    """Per-rule violation counts — the monitoring/QA view of the
    filter (one pass, one wide aggregate)."""
    df = df.withColumn("__qr_toks", tokenize(F.col(text_col)))
    rules = quality_rules(text_col, _toks=F.col("__qr_toks"), **thresholds)
    wide = df.agg(
        *[F.sum(pred.cast("long")).alias(name) for name, pred in rules.items()]
    )
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(name).alias("rule"), F.col(name).alias("n_violations"))
                    for name in rules
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")


def repetition_features(
    text_col: Column | str = "text",
    sep: str = "\n",
    _toks: Column | None = None,
    _lines: Column | None = None,
) -> dict[str, Column]:
    """Gopher repetition metrics (Rae et al. 2021, Table A1 — public):
    per-document fractions measuring self-repetition, all pure array
    expressions (zero shuffle; the O(lines²)/O(grams²) first-
    occurrence scans run inside codegen per row and documents are
    small relative to the corpus — this stage stays scan-bound).

    - dup_line_frac: repeated exact lines / lines (the same rule with
      sep="\\n\\n" is Gopher's duplicate-paragraph fraction)
    - dup_line_char_frac: characters inside repeated lines / chars
    - top{2,3,4}gram_char_frac: chars covered by the most frequent
      word n-gram (count × gram length; ties resolve to the longest
      gram — deterministic in both engines)
    - bullet_line_frac / ellipsis_line_frac: layout-noise shares
    - alpha_word_frac: words containing ≥1 ASCII letter / words

    Fractions are exact-int ratios → one IEEE division, so every
    metric hash-matches a DuckDB replay (same discipline as q115)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # _toks/_lines: pre-projected arrays evaluate split/tokenize once
    # per row instead of once per reference (projection-boundary rule)
    lines = _lines if _lines is not None else F.split(c, sep)
    n_lines = F.size(lines)
    first_occ = F.filter(
        lines, lambda x, i: F.array_position(lines, x) == i + F.lit(1)
    )
    line_chars = F.aggregate(
        F.transform(lines, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    first_chars = F.aggregate(
        F.transform(first_occ, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    toks = _toks if _toks is not None else tokenize(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)

    def top_gram_frac(n: int) -> Column:
        # most frequent n-gram via SORT + RUN-LENGTH scan: equal
        # grams are adjacent after array_sort, so one linear
        # aggregate pass finds (max run, longest gram among max
        # runs). The naive distinct×filter formulation is O(G²)
        # per document (and O(G³) if the max re-derives per
        # element) — a 10⁴-token document would stall the scan
        # stage; this is O(G log G).
        grams = F.array_sort(_ngrams(toks, n))
        st = F.aggregate(
            grams,
            F.struct(
                F.lit("").alias("prev"),
                F.lit(0).alias("run"),
                F.lit(0).alias("best"),
                F.lit(0).alias("blen"),
            ),
            lambda a, x: F.struct(
                x.alias("prev"),
                F.when(x == a["prev"], a["run"] + 1)
                .otherwise(F.lit(1))
                .alias("run"),
                F.greatest(
                    a["best"],
                    F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)),
                ).alias("best"),
                F.when(
                    F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
                    > a["best"],
                    F.length(x),
                )
                .when(
                    F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
                    == a["best"],
                    F.greatest(a["blen"], F.length(x)),
                )
                .otherwise(a["blen"])
                .alias("blen"),
            ),
        )
        # overlapping occurrences ('spam spam spam' → every bigram
        # identical) can cover more chars than the doc has; capped at
        # 1.0 so the metric stays a fraction (Gopher compares against
        # thresholds ≤0.20, unaffected by the cap). A top count of 1
        # is NO repetition — without the ≥2 guard every short
        # document flags on its longest (unique) n-gram, a degenerate
        # artifact of the count×len formula.
        return F.when(
            (st["best"] >= 2) & (n_chars > 0),
            F.least(
                F.lit(1.0),
                (st["best"] * st["blen"]).cast("double") / n_chars,
            ),
        ).otherwise(F.lit(0.0))

    bullet = F.size(
        F.filter(
            lines,
            lambda x: x.startswith("- ") | x.startswith("* ") | x.startswith("•"),
        )
    )
    ellipsis = F.size(
        F.filter(lines, lambda x: x.endswith("...") | x.endswith("…"))
    )
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    nz = F.greatest(n_lines, F.lit(1))
    nzt = F.greatest(n_tok, F.lit(1))
    return {
        "dup_line_frac": (n_lines - F.size(first_occ)).cast("double") / nz,
        "dup_line_char_frac": F.when(
            line_chars > 0,
            (line_chars - first_chars).cast("double") / line_chars,
        ).otherwise(F.lit(0.0)),
        "top2gram_char_frac": top_gram_frac(2),
        "top3gram_char_frac": top_gram_frac(3),
        "top4gram_char_frac": top_gram_frac(4),
        "bullet_line_frac": bullet.cast("double") / nz,
        "ellipsis_line_frac": ellipsis.cast("double") / nz,
        "alpha_word_frac": alpha.cast("double") / nzt,
    }


def gopher_rules(
    text_col: Column | str = "text",
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top2gram_char_frac: float = 0.20,
    max_top3gram_char_frac: float = 0.18,
    max_top4gram_char_frac: float = 0.16,
    max_bullet_line_frac: float = 0.90,
    max_ellipsis_line_frac: float = 0.30,
    min_alpha_word_frac: float = 0.80,
) -> dict[str, Column]:
    """Repetition/layout violation predicates with the published
    Gopher thresholds (Rae et al. 2021 A1.1) — compose with
    quality_rules via apply_quality_filter-style reason arrays."""
    f = repetition_features(text_col)
    return {
        "dup_lines": f["dup_line_frac"] > max_dup_line_frac,
        "dup_line_chars": f["dup_line_char_frac"] > max_dup_line_char_frac,
        "top2gram": f["top2gram_char_frac"] > max_top2gram_char_frac,
        "top3gram": f["top3gram_char_frac"] > max_top3gram_char_frac,
        "top4gram": f["top4gram_char_frac"] > max_top4gram_char_frac,
        "bullet_lines": f["bullet_line_frac"] > max_bullet_line_frac,
        "ellipsis_lines": f["ellipsis_line_frac"] > max_ellipsis_line_frac,
        "low_alpha": f["alpha_word_frac"] < min_alpha_word_frac,
    }


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """(id_col, n_bytes, n_compressed, compression_ratio) — zlib
    compressibility of each document, the entropy-proxy quality
    signal web-corpus pipelines use to catch both extremes: highly
    repetitive boilerplate compresses far below natural language
    (ratio << 0.4 at this level), while random/encrypted/binary junk
    barely compresses (ratio ≈ 1).

    This is the declared Pandas-UDF escape hatch — no Catalyst
    expression runs a real compressor — but it stays Arrow-batched
    mapInPandas (per-partition, fuses with the scan, no shuffle) and
    DETERMINISTIC: zlib at a fixed level is a pure function of the
    bytes, so re-runs and re-shards agree (pinned against direct
    python zlib in tests). Empty documents report ratio 0.0."""
    import pandas as pd  # noqa: F401 (executor-side)

    def run(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = [t.encode("utf-8") if t else b"" for t in pdf[text_col]]
            comp = [len(zlib.compress(b, level)) if b else 0 for b in raw]
            nb = [len(b) for b in raw]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": nb,
                    "n_compressed": comp,
                    "compression_ratio": [
                        (c / n) if n else 0.0 for c, n in zip(comp, nb)
                    ],
                }
            )

    # propagate the caller's id dtype — string/int32 ids must survive
    # unchanged, not fail a hardcoded `long` cast (ADVICE r3)
    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        run,
        f"{id_col} {id_type}, n_bytes long, n_compressed long, "
        "compression_ratio double",
    )


def blockword_filter(
    df: DataFrame,
    words: list[str] | DataFrame,
    text_col: str = "text",
    max_hits: int = 0,
    keep_counts: bool = False,
) -> DataFrame:
    """Token-boundary word-blocklist gate (the C4 "bad words" rule,
    Raffel et al. 2020 §2.2: drop any document containing a listed
    word) — matching is on WHOLE lowered whitespace tokens, never
    substrings ("class" does not hit a 3-letter entry).  The list
    itself is the caller's (policy, licensing); this operator is the
    scalable application.

    Two physical modes, picked by what you pass:
    - `words` as a python list → ONE InSet probe per token inside a
      shared prefilter (the language_id shape): zero shuffle, the
      right plan while the list fits a literal (≤ ~100k entries);
    - `words` as a single-column DataFrame → explode tokens once and
      LEFT SEMI join against the (auto-broadcast) list, count hits
      per doc, join decisions back: the right plan when the list is
      table-sized or already lives in storage.
    Both modes produce IDENTICAL decisions (pinned in tests).

    Keeps documents with hits <= max_hits (default 0 = C4's rule).
    `keep_counts=True` appends `n_blockword_hits` instead of
    dropping columns — the audit view."""
    from hadron_spark.functions.text import tokenize

    if isinstance(words, DataFrame):
        wcol = words.columns[0]
        wl = F.broadcast(
            words.select(F.lower(F.col(wcol)).alias("_bw")).distinct()
        )
        # hits are a function of the TEXT — compute once per distinct
        # text (duplicate rows would double the exploded token count
        # under a bare per-key groupBy) and fan the decision back out
        toks = df.select(F.col(text_col).alias("_t")).distinct().select(
            F.md5(F.col("_t")).alias("_k"),
            F.explode(tokenize(F.lower(F.col("_t")))).alias("_bw"),
        )
        hits = (
            toks.join(wl, "_bw", "left_semi")
            .groupBy("_k")
            .agg(F.count(F.lit(1)).alias("n_blockword_hits"))
        )
        out = df.withColumn("_k", F.md5(F.col(text_col))).join(
            hits, "_k", "left"
        ).withColumn(
            "n_blockword_hits",
            F.coalesce(F.col("n_blockword_hits"), F.lit(0)),
        ).drop("_k")
    else:
        wl_set = sorted({w.lower() for w in words})
        hits_expr = F.size(
            F.filter(
                tokenize(F.lower(F.col(text_col))),
                lambda t: t.isin(wl_set),
            )
        )
        # NULL text must count as 0 hits in BOTH modes (the DataFrame
        # mode coalesces missing hits to 0): bare size(filter(NULL))
        # is −1 under legacy sizeOfNull and NULL under ANSI — the
        # latter silently DROPS the row at the `<= max_hits` gate,
        # breaking the modes' decision-identity contract
        out = df.withColumn(
            "n_blockword_hits",
            F.when(F.col(text_col).isNotNull(), hits_expr)
            .otherwise(F.lit(0))
            .cast("long"),
        )
    kept = out.filter(F.col("n_blockword_hits") <= max_hits)
    return kept if keep_counts else kept.drop("n_blockword_hits")
