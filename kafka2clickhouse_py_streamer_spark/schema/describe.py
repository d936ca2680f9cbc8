"""DESCRIBE-TABLE-backed sink schema provider (the live S2 path).

The reference fetches the sink table's schema from the warehouse at
startup and RE-fetches it when an insert fails, so schema drift heals
itself (/root/reference/main.py:29-60, 433-437). The env-var provider
(`runner.EnvSchemaProvider`) makes that re-fetch vacuous in deployment:
it always returns the same env-derived schema. This module ships the
real path: run ``DESCRIBE TABLE`` over the sink's JDBC connection and
parse the (name, type) rows into the same :class:`TableSchema` the rest
of the pipeline consumes — so C1's drift-retry re-fetch can actually
observe a changed sink table.

The query execution is an injected callable (``describe``), keeping the
provider unit-testable without a live warehouse and letting deployments
swap JDBC for clickhouse-connect or an HTTP endpoint without touching
the retry state machine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession

from kafka2clickhouse_py_streamer_spark.schema.clickhouse import (
    build_table_schema,
)
from kafka2clickhouse_py_streamer_spark.schema.model import TableSchema

# () -> [(column_name, warehouse_type_string), ...]
DescribeFn = Callable[[], list[tuple[str, str]]]


class DescribeTableSchemaProvider:
    """Live sink-schema provider behind the ``SchemaProvider`` protocol
    (streaming/job.py): every ``fetch()`` re-runs DESCRIBE TABLE, so the
    drift-retry path sees the warehouse's CURRENT schema, not a cached
    or env-frozen one. (PipelineJob caches the result between batches;
    this provider is only called on first use and after a sink failure.)
    """

    def __init__(
        self,
        describe: DescribeFn,
        required_columns: list[str] | None = None,
        string_enum_columns: list[str] | None = None,
        datetime_columns: list[str] | None = None,
    ) -> None:
        self._describe = describe
        self._required = required_columns
        self._string_enums = string_enum_columns
        self._datetimes = datetime_columns
        self.fetch_count = 0

    def fetch(self) -> TableSchema:
        self.fetch_count += 1
        pairs = self._describe()
        if not pairs:
            raise ValueError(
                "DESCRIBE TABLE returned no columns — sink table missing?"
            )
        return build_table_schema(
            pairs,
            required_columns=self._required,
            string_enum_columns=self._string_enums,
            datetime_columns=self._datetimes,
        )


def jdbc_describe(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = "com.clickhouse.jdbc.ClickHouseDriver",
) -> DescribeFn:
    """DESCRIBE TABLE via Spark's JDBC source (no extra client library;
    the same connector the sink writes through). ClickHouse's DESCRIBE
    result has ``name``/``type`` columns (main.py:51-60); the row order
    is the table's column order, which the cast plan preserves.
    """
    # minimal identifier hygiene: table comes from config, not users,
    # but a stray quote/semicolon should fail loudly, not reach the DB
    if not table.replace(".", "").replace("_", "").isalnum():
        raise ValueError(f"suspicious table identifier: {table!r}")

    def run() -> list[tuple[str, str]]:
        df = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("query", f"DESCRIBE TABLE {table}")
            .option("driver", driver)
            .load()
        )
        return [(r["name"], r["type"]) for r in df.collect()]

    return run
