"""Streaming shell: micro-batch driver loop with sink + DLQ routing and
schema-drift retry.

Reference parity (re-expressed on Structured Streaming):

- C1 schema cache + drift-retry state machine (main.py:394-466): schema
  is fetched lazily and cached driver-side; on sink failure the schema is
  re-fetched, the batch re-validated and re-cast, and the write retried
  once; a second failure routes the batch's valid rows to the DLQ with
  the error string. Invalid rows always go to the DLQ.
- C3 at-least-once commit (main.py:525-526): Structured Streaming's
  checkpoint WAL commits offsets after the foreachBatch body returns —
  the same at-least-once contract as the reference's manual post-batch
  commit (a failed batch is replayed wholesale; duplicates possible —
  documented, not fought; SURVEY.md §7).
- C4 driver loop (main.py:468-534): ``writeStream.foreachBatch(...)
  .start()`` replaces the infinite poll loop.
- Empty-batch short-circuit (main.py:254-255, 337-339).

The sink is a plain callable — no Catalyst extension needed (SURVEY.md
§4). A ClickHouse-compatible deployment passes a JDBC writer with the
async-insert URL settings (main.py:329-335); tests pass in-memory
writers.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kafka2clickhouse_py_streamer_spark.schema.model import TableSchema


class SchemaProvider(Protocol):
    """Fetches the sink table's schema (the reference's DESCRIBE TABLE,
    main.py:29-60). Called lazily; re-called on sink failure (drift)."""

    def fetch(self) -> TableSchema: ...


Sink = Callable[[DataFrame], None]


class PipelineJob:
    """validate → cast → sink, with DLQ + drift retry. The foreachBatch
    body is exposed as :meth:`run_batch` so batch mode and tests share
    the exact code path (SURVEY.md §3.2)."""

    def __init__(
        self,
        schema_provider: SchemaProvider,
        sink: Sink,
        dlq_sink: Sink,
        value_col: str = "value",
    ) -> None:
        self._provider = schema_provider
        self._sink = sink
        self._dlq_sink = dlq_sink
        self._value_col = value_col
        self._schema: TableSchema | None = None  # driver-side cache

    def _get_schema(self) -> TableSchema:
        if self._schema is None:  # lazy build + cache (main.py:423-425)
            self._schema = self._provider.fetch()
        return self._schema

    def invalidate_schema(self) -> None:
        """Drop the cached schema (main.py:437)."""
        self._schema = None

    def run_batch(self, batch_df: DataFrame, batch_id: int = 0) -> None:
        # SPARK_GRAFT_BATCH_CACHE=on persists the RAW batch before the
        # empty probe: the probe scan and the tagged build otherwise
        # each read the source — measured as rows_read = 2x the logical
        # batch size (THROUGHPUT_r08 pre-fix), which against a real
        # broker is every Kafka fetch paid twice per trigger. Keep it
        # ON for remote sources (kafka — the deployment default); a
        # cheap re-readable local source may not need the cache build,
        # hence the knob (THROUGHPUT_r08 records both on parquet twins
        # — the local delta is inside run noise either way).
        # The empty-before-schema-fetch order (main.py:254-255,
        # 337-339) is unchanged either way.
        cache_raw = (
            os.environ.get("SPARK_GRAFT_BATCH_CACHE", "on") != "off"
        )
        if cache_raw:
            batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            tagged, valid_raw, typed, dlq = self._process(batch_df)
            try:
                try:
                    self._sink(typed)
                except Exception:
                    # schema drift suspected: re-fetch, re-process,
                    # retry once (main.py:433-445)
                    tagged.unpersist()
                    self.invalidate_schema()
                    tagged, valid_raw, typed, dlq = self._process(batch_df)
                    try:
                        self._sink(typed)
                    except Exception as exc:
                        # second failure → only the VALID rows go to
                        # the DLQ with the insert error; invalid rows
                        # keep their validation error (main.py:446-456)
                        failed = valid_raw.select(
                            F.col(self._value_col).alias("row"),
                            F.lit(
                                f"insert failed after retry: {exc}"
                            ).alias("error"),
                        )
                        dlq = dlq.unionByName(failed)
                if not dlq.isEmpty():
                    self._dlq_sink(dlq)
            finally:
                tagged.unpersist()
        finally:
            batch_df.unpersist()

    def _process(self, batch_df: DataFrame):
        from kafka2clickhouse_py_streamer_spark.pipeline.core import (
            cast_project,
            receiving_schema,
            split_tagged,
            tag_errors,
        )

        schema = self._get_schema()
        # persist the tagged frame: the validation UDF would otherwise
        # re-run for every downstream action (valid write, DLQ empty
        # check, DLQ write) — the reference validates each batch once
        # (main.py:428)
        tagged = tag_errors(batch_df, schema, self._value_col).persist()
        valid_raw, dlq = split_tagged(tagged, self._value_col)
        parsed = valid_raw.withColumn(
            "_parsed",
            F.from_json(F.col(self._value_col), receiving_schema(schema)),
        ).select("_parsed.*")
        return tagged, valid_raw, cast_project(parsed, schema), dlq

    def start(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        trigger_interval: str | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        """C4: start the micro-batch loop; checkpointing replaces the
        reference's manual offset commit (main.py:525-526).

        ``available_now=True`` runs in catch-up mode
        (``Trigger.AvailableNow``): process everything available in
        bounded micro-batches, then stop — the scheduled/cron
        deployment shape, with the same checkpoint (and therefore the
        same at-least-once contract) as the continuous service."""
        writer = stream_df.writeStream.foreachBatch(self.run_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_interval:
            writer = writer.trigger(processingTime=trigger_interval)
        return writer.start()


class StaticSchemaProvider:
    """Fixed-schema provider (tests / file-based deployments)."""

    def __init__(self, schema: TableSchema) -> None:
        self._schema = schema
        self.fetch_count = 0

    def fetch(self) -> TableSchema:
        self.fetch_count += 1
        return self._schema
