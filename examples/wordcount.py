"""WordCount — the reference's flagship example
(examples/WordCount.hs / examples/WordCountLocal.hs) as a
hadron_spark pipeline: 3 named steps with intermediate taps, the
third map-only (no shuffle), rerun-skippable.

Run: python examples/wordcount.py [sf_dir] [workdir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from hadron_spark import get_spark
from hadron_spark.llm.textstats import word_count
from hadron_spark.pipeline import RS_SKIP, Pipeline
from hadron_spark.sources.taps import Tap


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    workdir = sys.argv[2] if len(sys.argv) > 2 else None

    spark = get_spark("wordcount_example")
    # RS_SKIP = memoized restart: finished steps are skipped on rerun
    # (the reference's RSSkip, Controller.hs:873-886)
    pipe = Pipeline(spark, rerun=RS_SKIP, workdir=workdir)

    docs = Tap([f"{sf_dir}/documents.parquet"], "parquet")
    wc = pipe.connect("wordcount", word_count, [docs])
    top = pipe.connect(
        "truncate",
        lambda df: df.select(F.col("word").substr(1, 5).alias("prefix"), "cnt"),
        [wc],
    )
    totals = pipe.connect(
        "totals",
        lambda df: df.groupBy("prefix").agg(F.sum("cnt").alias("total")),
        [top],
    )
    totals.read(spark).orderBy(F.col("total").desc()).show(10)
    for step in pipe.steps:
        print(f"step {step.name}: {'skipped' if step.skipped else 'ran'}")
    spark.stop()


if __name__ == "__main__":
    main()
