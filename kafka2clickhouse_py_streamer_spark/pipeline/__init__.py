from kafka2clickhouse_py_streamer_spark.pipeline.core import (
    cast_project,
    process_batch,
    validate_split,
)

__all__ = ["cast_project", "process_batch", "validate_split"]
