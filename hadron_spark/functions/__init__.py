"""Scalar function library.

The reference ships no scalar functions — string/math/date work was
arbitrary Haskell inside conduits (SURVEY §2.8, e.g. B.words
tokenization in examples/WordCount.hs:21-24). Here the surface is the
whole of pyspark.sql.functions plus these domain helpers, all
JVM-side expressions (no Python UDFs in the hot path).
"""

from hadron_spark.functions.text import (
    tokenize,
    token_count,
    ngrams,
    char_shingles,
    stopword_ratio,
    quality_features,
    fingerprint,
)
from hadron_spark.functions.vectors import (
    dot,
    l2_norm,
    cosine_similarity,
)

__all__ = [
    "tokenize",
    "token_count",
    "ngrams",
    "char_shingles",
    "stopword_ratio",
    "quality_features",
    "fingerprint",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
