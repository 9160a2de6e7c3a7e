"""Operators: relational surface (SURVEY §2.3-2.7), typed map/reduce
(§2.3-2.4), and the join family (§2.5)."""

from hadron_spark.operators import joins, mapreduce, ops

__all__ = ["joins", "mapreduce", "ops"]
