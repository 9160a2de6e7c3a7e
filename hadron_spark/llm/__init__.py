"""Beyond-reference operators for large-scale training-data pipelines:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
multimodal binary columns, and text analysis.

These are first-class engine components (BASELINE.json north_star),
designed for the 100 TB case: every candidate-generation step is a
bucketed equi-join (never an n² cross join), every signature is a
JVM-side expression, and Python appears only in clearly-marked
decode stubs.
"""

from hadron_spark.llm import (
    bpe,
    classifier,
    dedup,
    dsir,
    embeddings,
    evaluation,
    filters,
    mixing,
    multimodal,
    packing,
    perplexity,
    report,
    similarity,
    textstats,
    unigram,
    urls,
)

__all__ = [
    "bpe",
    "classifier",
    "dedup",
    "dsir",
    "embeddings",
    "evaluation",
    "filters",
    "mixing",
    "packing",
    "perplexity",
    "report",
    "similarity",
    "multimodal",
    "textstats",
    "urls",
    "unigram",
]
