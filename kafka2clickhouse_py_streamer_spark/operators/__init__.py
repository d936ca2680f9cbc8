"""Relational operator library.

Every operator the engine claims is declared here as a :class:`Query`:
a PySpark DataFrame program plus (where SQL-expressible) a DuckDB oracle
SQL twin with identical column names/types. The driver hash-compares the
two at sf0.01 (see ``__spark_entry__.py``).
"""

from kafka2clickhouse_py_streamer_spark.operators.base import Query, all_queries  # noqa: F401
