from kafka2clickhouse_py_streamer_spark.sources.files import TABLES, load_table, load_tables  # noqa: F401
