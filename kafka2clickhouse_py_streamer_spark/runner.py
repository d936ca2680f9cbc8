"""Deployment entrypoint — the reference's ``python main.py`` (C4,
main.py:468-534, 542-583) as a thin wiring layer: env config → Kafka
source → PipelineJob(validate/cast → JDBC sink + Kafka DLQ) →
checkpointed micro-batch loop.

Run: ``python -m kafka2clickhouse_py_streamer_spark`` with the env vars
from config.REQUIRED_VARS (plus SINK_COLUMNS to describe the target
table as ``name:ChType`` pairs, replacing the reference's live DESCRIBE
TABLE when the sink is offline at startup).

Every component is injectable and tested on its own (job shell, pipeline
core, sinks, config); this module only composes them, mirroring how the
reference's main() composes consume/process/commit.
"""

from __future__ import annotations

import os

from pyspark.sql.streaming import StreamingQuery

from kafka2clickhouse_py_streamer_spark.config import JobConfig
from kafka2clickhouse_py_streamer_spark.schema.clickhouse import build_table_schema
from kafka2clickhouse_py_streamer_spark.schema.model import TableSchema
from kafka2clickhouse_py_streamer_spark.session import get_spark
from kafka2clickhouse_py_streamer_spark.sinks import jdbc_sink
from kafka2clickhouse_py_streamer_spark.sources.kafka import (
    kafka_dlq_writer,
    kafka_stream,
)
from kafka2clickhouse_py_streamer_spark.streaming.job import PipelineJob


class EnvSchemaProvider:
    """Sink schema from the SINK_COLUMNS env var
    (``name:Type,name:Type,…``). Deployments with a reachable warehouse
    would swap in a DESCRIBE-TABLE-backed provider (S2, main.py:29-60);
    the retry path in PipelineJob re-calls fetch() either way."""

    def __init__(self, cfg: JobConfig) -> None:
        self._cfg = cfg

    def fetch(self) -> TableSchema:
        raw = os.environ.get("SINK_COLUMNS", "")
        pairs = [p.split(":", 1) for p in raw.split(",") if ":" in p]
        if not pairs:
            raise ValueError(
                "SINK_COLUMNS must list the sink schema as name:Type pairs"
            )
        return build_table_schema(
            [(n.strip(), t.strip()) for n, t in pairs],
            required_columns=self._cfg.required_columns,
            string_enum_columns=self._cfg.string_enum_columns,
            datetime_columns=self._cfg.datetime_columns,
        )


def pick_schema_provider(spark, cfg: JobConfig):
    """Live DESCRIBE TABLE when SINK_SCHEMA_SOURCE=describe (the
    reference's S2 behavior, main.py:29-60 — drift-retry re-fetch sees
    the warehouse's current schema); env-frozen SINK_COLUMNS otherwise
    (offline/dev deployments)."""
    if os.environ.get("SINK_SCHEMA_SOURCE", "env").lower() == "describe":
        from kafka2clickhouse_py_streamer_spark.schema.describe import (
            DescribeTableSchemaProvider,
            jdbc_describe,
        )

        return DescribeTableSchemaProvider(
            jdbc_describe(spark, cfg.sink_url, cfg.sink_table),
            required_columns=cfg.required_columns,
            string_enum_columns=cfg.string_enum_columns,
            datetime_columns=cfg.datetime_columns,
        )
    return EnvSchemaProvider(cfg)


def build_query(
    spark, cfg: JobConfig, available_now: bool = False
) -> StreamingQuery:
    """``available_now=True`` runs the same wiring in bounded catch-up
    mode (Trigger.AvailableNow) — scheduled deployments and the live
    integration smoke (tools/live_smoke.py)."""
    job = PipelineJob(
        pick_schema_provider(spark, cfg),
        sink=jdbc_sink(cfg.sink_url, cfg.sink_table),
        dlq_sink=kafka_dlq_writer(cfg.kafka_bootstrap_servers, cfg.dlq_topic)
        if cfg.dlq_topic
        else (lambda df: None),
    )
    stream = kafka_stream(
        spark,
        cfg.kafka_bootstrap_servers,
        cfg.kafka_topic,
        starting_offsets=cfg.starting_offsets,
        max_offsets_per_trigger=cfg.max_offsets_per_trigger,
        min_partitions=cfg.kafka_min_partitions or None,
    )
    return job.start(stream, cfg.checkpoint_dir, available_now=available_now)


def main() -> None:
    cfg = JobConfig.from_env()
    spark = get_spark(app_name="kafka-to-warehouse")
    query = build_query(spark, cfg)
    try:
        query.awaitTermination()
    except KeyboardInterrupt:
        # graceful close (main.py:528-534); checkpoint WAL preserves
        # the at-least-once contract across restarts
        query.stop()


if __name__ == "__main__":
    main()
