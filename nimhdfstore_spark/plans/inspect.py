"""Physical-plan inspection helpers — the engine's `.explain` checks as code.

The 100 TB design contract (SURVEY §4) is about plan *shapes*: positional
predicates must reach the Parquet scan, projections must prune the read
schema, small join sides must broadcast, hot paths must stay inside
whole-stage codegen. These helpers read those properties off the executed
plan so tests (tests/test_plans.py) and interactive tuning can assert them
instead of eyeballing `.explain` output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Executed-plan string (AQE: final plan only after an action ran)."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """The ``PushedFilters`` lists of every Parquet scan in the plan."""
    out = []
    for line in executed_plan(df).splitlines():
        if "PushedFilters:" in line:
            seg = line.split("PushedFilters:")[1]
            seg = seg.split("]", 1)[0].lstrip(" [")
            out.append(seg)
    return out


def read_schema(df: DataFrame) -> list[str]:
    """The ``ReadSchema`` struct strings of every scan (column pruning)."""
    return [
        line.split("ReadSchema:")[1].strip()
        for line in executed_plan(df).splitlines()
        if "ReadSchema:" in line
    ]


def has_broadcast(df: DataFrame) -> bool:
    plan = executed_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def in_codegen(df: DataFrame) -> bool:
    """True when the plan has whole-stage-codegen spans and no Python eval
    stage (``df`` should have been executed once so AQE is final)."""
    plan = executed_plan(df)
    has_span = "WholeStageCodegen" in plan or "*(" in plan
    has_python = "BatchEvalPython" in plan or "ArrowEvalPython" in plan
    return has_span and not has_python
