"""Physical-plan inspection utilities.

The plan IS the product at 100 TB: a query that silently loses parquet
pushdown, broadcasts, or whole-stage codegen is a scale regression even
when its rows are right. These helpers turn `.explain` text into
assertable facts; `tests/test_plans.py` pins the plan shape of every
headline operator with them, so regressions fail in CI rather than on
the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The final (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def pushed_filter_columns(df: DataFrame) -> list[str]:
    """Column names appearing in any scan's PushedFilters list.

    Plan lines may be width-truncated by ``toString``, so the parse
    stops at end-of-line, not at the (possibly missing) closing
    bracket."""
    cols: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\n\]]*)", executed_plan(df)):
        cols += re.findall(r"\((\w+)", m.group(1))
    return cols


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns each parquet scan actually reads (flattened), from the
    FileScan output list (survives line truncation better than
    ReadSchema)."""
    cols: list[str] = []
    plan = executed_plan(df)
    for m in re.finditer(r"FileScan \w+ \[([^\n\]]*)", plan):
        cols += [c.split("#")[0].strip() for c in m.group(1).split(",") if c.strip()]
    for m in re.finditer(r"ReadSchema: struct<([^\n>]*)", plan):
        cols += [f.split(":")[0].strip() for f in m.group(1).split(",") if ":" in f]
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (reused exchanges not re-counted)."""
    plan = executed_plan(df)
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def no_python_udfs(df: DataFrame) -> bool:
    """True when nothing in the plan drops out of the JVM: no
    row-at-a-time Python (BatchEvalPython) and no Arrow UDF stages."""
    plan = executed_plan(df)
    return "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def no_nested_loops(df: DataFrame) -> bool:
    plan = executed_plan(df)
    return "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
