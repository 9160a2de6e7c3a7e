"""Web-crawl cleaning — the hygiene chain in front of every corpus:
HTML boilerplate strip → per-doc line dedup → PII redaction →
Gopher repetition gate, fused into one narrow plan (the only shuffle
is the final accounting aggregate).

Run: python examples/crawl_clean.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hadron_spark import get_spark
from hadron_spark.functions.text import dedup_lines, html_to_text, redact_pii
from hadron_spark.llm.filters import gopher_rules
from hadron_spark.sources.taps import Tap


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("crawl_clean_example")

    docs = Tap([f"{sf_dir}/documents.parquet"], "parquet").read(spark)
    # stand-in for crawled pages: wrap each doc in HTML chrome with
    # nav boilerplate and a contact line
    html = F.concat(
        F.lit("<html><head><script>nav()</script></head><body><p>"),
        F.col("text"),
        F.lit(
            "</p><p>Subscribe now</p><p>Subscribe now</p>"
            "<p>Contact crawler@example.net or +1 (555) 010-7788</p>"
            "</body></html>"
        ),
    )
    n0 = docs.count()

    cleaned = docs.withColumn(
        "text", redact_pii(dedup_lines(html_to_text(html)))
    )
    rules = gopher_rules("text")
    flagged = F.array_compact(
        F.array(*[F.when(pred, F.lit(name)) for name, pred in rules.items()])
    )
    gated = cleaned.withColumn("flags", flagged).withColumn(
        "keep", F.size("flags") == 0
    )
    kept = gated.filter("keep")
    n1 = kept.count()

    print(f"crawled docs:   {n0}")
    print(f"kept after gate:{n1:>5}  (-{n0 - n1})")
    sample = kept.select("text").first()["text"]
    assert "<EMAIL>" in sample or "crawler@example.net" not in sample
    print("sample cleaned doc (first 160 chars):")
    print(" ", sample[:160].replace("\n", " | "))
    spark.stop()


if __name__ == "__main__":
    main()
