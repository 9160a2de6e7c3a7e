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


def quality_rules(
    text_col: Column | str = "text",
    min_chars: int = 50,
    max_chars: int = 100_000,
    min_stopword_hits: int = 2,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
) -> dict[str, Column]:
    """name → violation predicate (True = document breaks the rule).
    Thresholds follow the published heuristics; all tunable."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokenize(c)
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
    rules = quality_rules(text_col, **thresholds)
    reasons = F.filter(
        F.array(
            *[F.when(pred, F.lit(name)) for name, pred in rules.items()]
        ),
        lambda r: r.isNotNull(),
    )
    out = df.withColumn("drop_reasons", reasons)
    return out.withColumn("keep", F.size("drop_reasons") == 0)


def rule_violation_counts(df: DataFrame, text_col: str = "text", **thresholds) -> DataFrame:
    """Per-rule violation counts — the monitoring/QA view of the
    filter (one pass, one wide aggregate)."""
    rules = quality_rules(text_col, **thresholds)
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
