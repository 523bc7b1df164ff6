"""Physical-plan audits.

The reference hand-schedules its execution (OOPK batch pipeline,
query/aql_batchexecutor.go); we *declare* plans and let Catalyst pick the
strategy — these helpers make the resulting physical plan assertable so
scale properties (pushdown, pruning, broadcast, shuffle count) are tested,
not assumed (SURVEY §4 verdict).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan_str(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_explain(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def scan_info(df: DataFrame) -> list[dict[str, str]]:
    """Extract per-FileScan details: pushed filters, partition filters,
    read schema. One dict per scan in the plan."""
    plan = executed_plan_str(df)
    out = []
    for m in re.finditer(r"FileScan parquet [^\n]*", plan):
        line = m.group(0)
        info = {}
        for key in ("PushedFilters", "PartitionFilters", "DataFilters", "ReadSchema"):
            km = re.search(rf"{key}: (\[[^\]]*\]|struct<[^>]*>)", line)
            if km:
                info[key] = km.group(1)
        out.append(info)
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = executed_plan_str(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobin)",
                          plan))


def has_broadcast_join(df: DataFrame) -> bool:
    plan = executed_plan_str(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in executed_plan_str(df)
