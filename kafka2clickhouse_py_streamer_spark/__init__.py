"""PySpark-native analytics engine with the capabilities of
``jarupulapremkumar/kafka2clickhouse-py-streamer`` (reference: streaming
Kafka JSON -> schema-driven validate/cast -> ClickHouse with DLQ), extended
with a full relational operator surface and LLM-data-pipeline operators
(dedup, similarity search, multimodal plumbing, text analysis).

Design: everything is declared via the DataFrame / SQL API so Catalyst +
Tungsten pick the physical strategy; Python UDFs appear only where built-in
operators genuinely cannot express the semantics (and then as Arrow-batched
pandas UDFs). See SURVEY.md for the blueprint and reference citations.
"""

__version__ = "0.1.0"

from kafka2clickhouse_py_streamer_spark.session import get_spark  # noqa: F401
