from mapreducemovieanalysis_cloud_spark.plans.explain import (
    exchange_input_columns,
    executed_plan,
    explain_formatted,
    pushed_filters,
    read_schema_columns,
    scan_columns_minimal,
    uses_broadcast_join,
    uses_sort_merge_join,
    uses_take_ordered,
    whole_stage_codegen_spans,
)

__all__ = [
    "exchange_input_columns",
    "executed_plan",
    "explain_formatted",
    "pushed_filters",
    "read_schema_columns",
    "scan_columns_minimal",
    "uses_broadcast_join",
    "uses_sort_merge_join",
    "uses_take_ordered",
    "whole_stage_codegen_spans",
]
