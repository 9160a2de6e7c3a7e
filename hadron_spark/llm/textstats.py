"""Text analysis operators over a document corpus: language ID,
quality scoring, token counting, document fingerprinting.

Everything is a Catalyst expression over the `documents` table shape
(doc_id, text, lang, source, n_chars — FIXTURES.md). The flagship
word-count mirrors the reference's canonical example
(examples/WordCount.hs:21-29: tokenize → count per word).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadron_spark.functions.text import (
    fingerprint,
    quality_features,
    token_count,
    tokenize,
)

# tiny per-language marker lexicons for the n-gram/stopword heuristic
# language identifier (public-knowledge function words).
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
}


def word_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The reference's flagship query (examples/WordCount.hs:26-29):
    tokenize → explode → count per word. One shuffle; partial
    aggregation makes the network cost |vocab|, not |tokens|."""
    return (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def token_counts(df: DataFrame, group_col: str = "source", text_col: str = "text") -> DataFrame:
    """Total token count per group — whitespace + regex tokenization,
    no explode (array size per row, then sum)."""
    return df.groupBy(group_col).agg(
        F.sum(token_count(F.col(text_col))).alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality features (length/stopword/token stats)."""
    feats = quality_features(F.col(text_col))
    return df.select(
        id_col,
        *[expr.alias(name) for name, expr in feats.items()],
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: score = fraction of tokens hitting each
    language's marker lexicon; argmax with deterministic tie-break on
    language code. Appends `lang_pred` + `lang_score`."""
    toks = F.transform(tokenize(F.col(text_col)), lambda t: F.lower(t))

    def lang_score(lang: str, markers: list[str]):
        # closure capture — a 2-param lambda would receive the array
        # index as its second argument
        hits = F.size(F.filter(toks, lambda t: t.isin(markers)))
        return F.struct(
            (hits.cast("double") / F.greatest(F.size(toks), F.lit(1))).alias("score"),
            F.lit(lang).alias("lang"),
        )

    scores = F.array(
        *[lang_score(lang, markers) for lang, markers in sorted(_LANG_MARKERS.items())]
    )
    best = F.array_max(scores)
    return df.withColumn("lang_pred", best["lang"]).withColumn(
        "lang_score", best["score"]
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document canonical fingerprint (order/case-insensitive md5
    — functions.text.fingerprint)."""
    return df.select(id_col, fingerprint(F.col(text_col)).alias("fp"))
