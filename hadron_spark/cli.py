"""User entry points: SQL view registration and a query CLI.

The reference's user surface is `hadoopMain` — compile a binary, run
`prog appname` (Controller.hs:966-989). The Spark equivalents: bind
the fixture tables as SQL views and run ad-hoc `spark.sql`, or run a
registry query by name from the shell:

    python -m hadron_spark.cli q01_pricing_summary --sf-dir /root/testdata/sf0.01
    python -m hadron_spark.cli --list
    python -m hadron_spark.cli --sql "SELECT COUNT(*) FROM lineitem"
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Bind every fixture table under `sf_dir` as a temp view so raw
    spark.sql works against the same names the DuckDB oracle uses.
    Views are lazy — no data is read until queried."""
    from hadron_spark.queries import load

    bound = []
    for t in TABLES:
        try:
            load(spark, sf_dir, t).createOrReplaceTempView(t)
            bound.append(t)
        except Exception:
            continue  # table absent at this SF — skip
    return bound


def run_query(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    from hadron_spark.queries import QUERIES

    if name not in QUERIES:
        raise KeyError(f"unknown query {name!r}; --list shows the registry")
    return QUERIES[name](spark, sf_dir)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hadron_spark.cli")
    p.add_argument("query", nargs="?", help="registry query name (e.g. q01_pricing_summary)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--sql", help="ad-hoc SQL over the registered fixture views")
    p.add_argument("--list", action="store_true", help="list registry queries")
    p.add_argument("--out", help="write result parquet here instead of showing")
    p.add_argument("-n", type=int, default=20, help="rows to show")
    args = p.parse_args(argv)

    from hadron_spark.queries import QUERIES

    if args.list:
        for name in sorted(QUERIES):
            print(name)
        return 0

    from hadron_spark import get_spark

    spark = get_spark("hadron_spark_cli")
    try:
        if args.sql:
            register_views(spark, args.sf_dir)
            df = spark.sql(args.sql)
        elif args.query:
            df = run_query(spark, args.query, args.sf_dir)
        else:
            p.error("need a query name, --sql, or --list")
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        else:
            df.show(args.n, truncate=False)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
