"""Physical-plan inspection helpers (SURVEY.md §4).

Tests use these to assert the plans we designed for actually materialize:
filters reach the parquet scan (PushedFilters), small sides broadcast, and
hot paths stay inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in a PushedFilters clause of the plan."""
    plan = formatted_plan(df)
    pushed = "\n".join(line for line in plan.splitlines() if "PushedFilters" in line)
    for frag in fragments:
        assert frag in pushed, f"filter {frag!r} not pushed; plan:\n{plan}"


def assert_broadcast(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "Broadcast" in plan, f"no broadcast in plan:\n{plan}"


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the pre-execution plan —
    the unit every scale review counts first.  Counts the ``(n) Exchange``
    detail headers so each plan node is counted exactly once (the formatted
    plan also renders every node in the tree sketch)."""
    import re  # noqa: PLC0415

    plan = formatted_plan(df)
    return sum(
        1 for line in plan.splitlines()
        if re.match(r"^\(\d+\) Exchange", line.strip())
    )


def assert_partition_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in a PartitionFilters clause — hive-style
    partition pruning actually reached the scan."""
    plan = formatted_plan(df)
    pf = "\n".join(line for line in plan.splitlines() if "PartitionFilters" in line)
    for frag in fragments:
        assert frag in pf, f"partition filter {frag!r} not pruned; plan:\n{plan}"


def assert_codegen(df: DataFrame) -> None:
    """Assert the hot path runs inside whole-stage codegen.

    Under AQE the pre-execution formatted plan shows only the logical
    skeleton, so this materializes the query and inspects the FINAL executed
    plan, where codegen stages appear as ``*(n)`` prefixes.
    """
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
    assert "*(" in plan or "WholeStageCodegen" in plan, \
        f"no codegen spans in executed plan:\n{plan}"
