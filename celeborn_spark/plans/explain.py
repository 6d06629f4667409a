"""Physical-plan inspection: the feedback loop that keeps operators
scale-honest. Each helper answers a question the 100 TB design cares
about: did the filter reach the scan (reference analogue: mapId bitmap
skipping, CelebornInputStream.java:364)? did the dim join broadcast
(no fact shuffle)? how many exchanges (each is a full Celeborn-style
shuffle) does the plan pay?

Uses `formatted` explain output: under AQE the plain executedPlan
string is an unfinalized AdaptiveSparkPlan with truncated scan
details; formatted mode always prints full PushedFilters/ReadSchema
and codegen annotations.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm  # type: ignore[attr-defined]
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def has_pushed_filters(df: DataFrame, *needles: str) -> bool:
    """True if a scan node advertises pushed filters mentioning every
    needle (column name)."""
    plan = explain_formatted(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = ", ".join(m)
    return bool(m) and all(n in pushed for n in needles)


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read from parquet, one per scan (column
    pruning check)."""
    plan = explain_formatted(df)
    out = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        out.append([part.split(":")[0].strip() for part in m.split(",") if part.strip()])
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    plan = explain_formatted(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_whole_stage_codegen(df: DataFrame) -> bool:
    # Diagnostic-only helper (test/debug path, never in an operator):
    # under AQE codegen annotations exist only in the FINAL plan, and
    # only THIS df's own execution finalizes it (count() would build a
    # different plan) — collect, then inspect.
    df.collect()
    plan = physical_plan(df)
    return "WholeStageCodegen" in plan or "codegen id" in explain_formatted(df)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (each = one full map->reduce data
    movement; the thing to minimize).

    Counts on the toString physical plan: the FORMATTED explain puts
    `Exchange` and its `Arguments: hashpartitioning(...)` on separate
    lines, so the old formatted-based regex matched nothing and every
    <=N assertion passed vacuously (caught in round 5 by the
    epoch-shuffle pin expecting == 1 and getting 0)."""
    plan = physical_plan(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))
