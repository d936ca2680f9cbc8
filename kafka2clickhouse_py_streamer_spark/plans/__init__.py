from kafka2clickhouse_py_streamer_spark.plans.analysis import (
    python_row_ops,
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    strip_cached_subtrees,
    whole_stage_codegen_spans,
)

__all__ = [
    "count_exchanges",
    "formatted_plan",
    "has_broadcast_join",
    "pushed_filters",
    "python_row_ops",
    "read_schema_columns",
    "strip_cached_subtrees",
    "whole_stage_codegen_spans",
]
