"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (pricing summary) on sf0.001.
queries()     — one entry per implemented operator from SURVEY.md §2
                (+ LLM-pipeline extensions), from hadron_spark.queries.
oracle_sql()  — DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from hadron_spark.queries import QUERIES

    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry ordered oracle-backed-first so every slot of the
    driver's hash-checked window carries hard value-exact signal;
    rows-only entries (approximate/iterative/binary ops with no
    SQL-expressible oracle) keep their tests and follow after."""
    from hadron_spark.queries import ORACLES, QUERIES

    ordered = {k: v for k, v in QUERIES.items() if k in ORACLES}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ORACLES})
    return ordered


def oracle_sql() -> dict[str, str]:
    from hadron_spark.queries import ORACLES

    return dict(ORACLES)
