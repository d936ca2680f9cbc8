from kafka2clickhouse_py_streamer_spark.schema.model import (  # noqa: F401
    ColumnMeta,
    TableSchema,
)
from kafka2clickhouse_py_streamer_spark.schema.clickhouse import (  # noqa: F401
    ch_type_to_spark,
    build_table_schema,
)
