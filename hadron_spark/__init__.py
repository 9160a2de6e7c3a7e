"""hadron_spark — a PySpark-native analytics/ETL engine with the query
and data-processing capabilities of Soostone/hadron (reference at
/root/reference), re-expressed Spark-first.

The reference is a Haskell combinator library for multi-stage Hadoop
Streaming MapReduce (typed Taps + Protocol codecs, conduit mappers /
combiners / reducers over composite keys, monoidal n-way reduce-side
joins, and a free-monad Controller orchestrating a DAG of MR jobs —
see reference src/Hadron/Controller.hs:20-32). This package maps that
surface onto the DataFrame/SQL API so Catalyst + Tungsten pick the
physical strategy:

- taps            — Tap datasets + format codecs  (Controller.hs:334-514, Protocol.hs)
- pipeline        — Controller/DAG runner + RerunStrategy (Controller.hs:610-989)
- mapreduce       — typed map/reduce/combiner surface     (Types.hs, Basic.hs)
- joins           — monoidal n-way required/optional join (Join.hs)
- fanout          — dynamic multi-file sink               (Run/FanOut.hs)
- ops             — relational operator surface (filters/aggs/windows/set ops)
- functions       — scalar/text/vector function library
- llm             — beyond-reference LLM-data-pipeline operators:
                    dedup (exact/minhash/simhash/jaccard/embedding),
                    similarity search, multimodal columns, text analysis
"""

from hadron_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
