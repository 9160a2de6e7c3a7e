"""Physical-plan introspection over DataFrames.

All helpers parse the executed-plan string — the same text
`.explain("formatted")` prints — so they see exactly what will run
(post-AQE initial plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what .explain() prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def _plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def shuffle_count(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges in the physical plan (broadcast
    exchanges excluded — they move only the small side). Every one is
    a full network/disk round of the data — the unit of cost at
    100 TB."""
    plan = _plan(df)
    return plan.count("Exchange ") - plan.count("BroadcastExchange ")


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen subtrees (from the codegen
    explain, which reports them pre-execution even under AQE). More
    of the plan inside fewer spans = more generated JVM loops,
    fewer interpreted operators."""
    text = explain_str(df, "codegen")
    # header: "Found N WholeStageCodegen subtrees."
    for line in text.splitlines():
        if "WholeStageCodegen subtrees" in line:
            return int(line.split("Found")[1].split("WholeStageCodegen")[0].strip())
    return 0


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the parquet scan received pushed-down predicates
    mentioning each fragment (column name etc.)."""
    plan = _plan(df)
    if "PushedFilters: []" in plan or "PushedFilters" not in plan:
        raise AssertionError(f"no pushed filters in plan:\n{plan}")
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    for frag in fragments:
        if frag not in pushed:
            raise AssertionError(f"filter on {frag!r} not pushed: {pushed}")


def assert_broadcast_join(df: DataFrame, expected: int = 1) -> None:
    """Assert at least `expected` broadcast joins (true map-side
    joins; the reference could only claim these, README.md:20-25)."""
    n = _plan(df).count("BroadcastHashJoin") + _plan(df).count("BroadcastNestedLoopJoin")
    if n < expected:
        raise AssertionError(f"expected ≥{expected} broadcast joins, found {n}")


def assert_partial_aggregation(df: DataFrame) -> None:
    """Assert map-side partial aggregation precedes the exchange —
    the automatic 'combiner' (reference Basic.hs:163-174)."""
    plan = _plan(df)
    if plan.count("HashAggregate") < 2 and plan.count("SortAggregate") < 2:
        raise AssertionError(f"no partial+final aggregation pair:\n{plan}")


def assert_no_shuffle(df: DataFrame) -> None:
    """Assert the plan is narrow (map-only job — reference
    Controller.hs:902-906 numReduce=0 path)."""
    n = shuffle_count(df)
    if n:
        raise AssertionError(f"expected narrow plan, found {n} exchanges")


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of WindowExec nodes with an EMPTY partitionSpec — each
    one funnels its whole input through a single task (`WindowExec:
    No Partition Defined` at runtime), the per-operator scale killer
    VERDICT r1 flagged. Counted from the plan JSON, which exposes
    partitionSpec structurally (string matching can't see it)."""
    import json

    plan = json.loads(df._jdf.queryExecution().executedPlan().toJSON())
    bad = 0

    def walk(node):
        nonlocal bad
        if isinstance(node, dict):
            cls = node.get("class", "")
            if cls.endswith("WindowExec") or cls.endswith(
                "WindowGroupLimitExec"
            ):
                if not node.get("partitionSpec", []):
                    bad += 1
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(plan)
    return bad


def assert_no_unpartitioned_window(df: DataFrame) -> None:
    """Assert the plan contains no single-partition window — the
    contract ops.range_rank / ops.spine_running exist to satisfy."""
    n = unpartitioned_window_count(df)
    if n:
        raise AssertionError(
            f"{n} unpartitioned Window node(s) in plan:\n{_plan(df)}"
        )
