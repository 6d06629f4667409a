from celeborn_spark.plans.explain import (
    physical_plan,
    explain_formatted,
    has_broadcast_join,
    has_pushed_filters,
    has_whole_stage_codegen,
    read_schema_columns,
    count_exchanges,
)

__all__ = [
    "physical_plan",
    "explain_formatted",
    "has_broadcast_join",
    "has_pushed_filters",
    "has_whole_stage_codegen",
    "read_schema_columns",
    "count_exchanges",
]
