"""Operators: relational surface (SURVEY §2.3-2.7), typed map/reduce
(§2.3-2.4), the join family (§2.5), graph resolution, and table
maintenance (merge/CDC)."""

from hadron_spark.operators import (
    expectations,
    graph,
    joins,
    maintenance,
    mapreduce,
    ops,
    robust,
    sketch,
    survival,
)

__all__ = [
    "expectations", "graph", "joins", "maintenance", "mapreduce", "ops",
    "robust", "sketch", "survival",
]
