"""Plan inspection helpers — keep the physical plans honest.

Used by tests/test_plans.py to lock in the plan properties that matter at
100 TB: column pruning reaching the parquet scan, predicate pushdown,
partition pruning on the per-predicate edge layout, broadcast sides.
A regression here (e.g. a refactor that inserts a Python UDF before a
filter) is a silent 100× slowdown at scale — so it fails CI instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    je = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return je.explainString(mode)


def read_schemas(plan: str) -> list[str]:
    return [l.strip() for l in plan.splitlines() if l.strip().startswith("ReadSchema")]


def pushed_filters(plan: str) -> list[str]:
    return [l.strip() for l in plan.splitlines() if l.strip().startswith("PushedFilters")]


def partition_filters(plan: str) -> list[str]:
    return [l.strip() for l in plan.splitlines() if l.strip().startswith("PartitionFilters")]


def has_broadcast(plan: str) -> bool:
    return "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def exchange_count(plan: str) -> int:
    return sum(
        1
        for l in plan.splitlines()
        if l.strip().startswith("(") and "Exchange" in l and "Broadcast" not in l
    )
