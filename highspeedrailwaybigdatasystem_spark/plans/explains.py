"""Physical-plan inspection helpers (used by tests/test_plans.py and for
interactive `.explain`-driven iteration — SURVEY.md §5.2 explain snapshots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, run: bool = False) -> str:
    """The physical plan string. With run=True the query executes first so
    AQE finalizes the plan (codegen spans, runtime join demotions)."""
    if run:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') as a string (scan details: PushedFilters,
    ReadSchema, PartitionFilters)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def assert_in_plan(df: DataFrame, *markers: str, run: bool = False) -> None:
    plan = executed_plan(df, run=run)
    for m in markers:
        assert m in plan, f"expected {m!r} in plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, *markers: str, run: bool = False) -> None:
    plan = executed_plan(df, run=run)
    for m in markers:
        assert m not in plan, f"unexpected {m!r} in plan:\n{plan}"
