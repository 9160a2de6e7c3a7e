"""Capture `.explain("formatted")` for headline queries into
plans/r08/<query>_<tag>.txt — the optimization round's before/after
evidence (judge checks plan claims against these files).

Usage: python tools/capture_plans_r08.py <before|after> [query ...]
       (default: every HEADLINE query from bench.py)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE
    from hadron_spark import get_spark
    from hadron_spark.queries import QUERIES

    names = sys.argv[2:] or HEADLINE
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r08",
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture_plans_r08")
    for name in names:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            plan = f"PLAN CAPTURE FAILED: {e!r}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(f"-- {name} [{tag}] sf_dir={sf_dir}\n")
            f.write(plan)
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
