"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the engine package
(``kafka2clickhouse_py_streamer_spark.operators`` / ``.llm`` /
``.streaming``); this module only adapts the registry to the driver's
interface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

REPO_DIR = "/root/repo"
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from pyspark.sql import DataFrame, SparkSession

from kafka2clickhouse_py_streamer_spark.operators.base import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from kafka2clickhouse_py_streamer_spark.operators.aggregates import (
        q01_pricing_summary,
    )

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin SQL for every SQL-expressible query; approximate /
    sketch-based ops are omitted (rows-only check)."""
    return {
        name: q.oracle
        for name, q in all_queries().items()
        if q.oracle is not None
    }
