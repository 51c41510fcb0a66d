"""Physical-plan inspection utilities.

At 100 TB the difference between a right and wrong plan is the job: a
scan that doesn't prune columns reads 50× too much, a probe join that
shuffles the index instead of broadcasting the query side moves the whole
corpus. These helpers make plan properties assertable in tests so they
can't silently regress."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["physical_plan", "plan_report"]


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_report(df: DataFrame) -> dict:
    """Summarize scale-relevant plan properties."""
    plan = physical_plan(df)
    return {
        "plan": plan,
        "has_broadcast_join": "BroadcastHashJoin" in plan,
        "has_sortmerge_join": "SortMergeJoin" in plan,
        "has_shuffle": "Exchange" in plan,
        "partial_aggregate": "partial_" in plan or "Partial" in plan,
        "whole_stage_codegen": "WholeStageCodegen" in plan,
        "read_schemas": [
            line.strip() for line in plan.splitlines() if "ReadSchema" in line
        ],
        "pushed_filters": [
            line.strip() for line in plan.splitlines() if "PushedFilters" in line
        ],
    }
