"""Physical-plan inspection helpers (SURVEY.md §4.2).

The optimizer work in this engine is *verification*, not
implementation: Catalyst already does pushdown/pruning/broadcast — these
helpers let tests assert the plan we'd want at 100 TB actually got
picked (PushedFilters reaches the scan, dims broadcast, top-k plans
TakeOrderedAndProject, no Python eval in hot paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> None:
    plan = plan_string(df, mode)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> None:
    plan = plan_string(df, mode)
    for needle in needles:
        assert needle not in plan, f"did not expect {needle!r} in plan:\n{plan}"
