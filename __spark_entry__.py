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


def _current_round() -> int:
    """Round number for window rotation: 1 + the highest CORRECTNESS_r*.json
    already on disk (i.e. the round about to be recorded). Falls back to 0 so
    the rotation is deterministic even on a fresh checkout."""
    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best = 0
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            best = max(best, int(m.group(1)))
    return best + 1


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry ordered oracle-backed-first so every slot of the
    driver's hash-checked window carries hard value-exact signal;
    rows-only entries (approximate/iterative/binary ops with no
    SQL-expressible oracle) keep their tests and follow after.

    The oracle-backed block is ordered by md5(name + round) so the
    driver's fixed-size window samples a FRESH subset each round —
    rounds 3-5 all hashed the same first 50 registration-order names,
    leaving 200+ oracle-backed queries without driver-grade coverage."""
    import hashlib

    from hadron_spark.queries import ORACLES, QUERIES

    rnd = str(_current_round())

    def rot(name: str) -> str:
        return hashlib.md5((name + rnd).encode()).hexdigest()

    backed = sorted((k for k in QUERIES if k in ORACLES), key=rot)
    ordered = {k: QUERIES[k] for k in backed}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ORACLES})
    return ordered


def oracle_sql() -> dict[str, str]:
    from hadron_spark.queries import ORACLES

    return dict(ORACLES)
