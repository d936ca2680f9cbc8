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

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kafka2clickhouse_py_streamer_spark.schema.model import TableSchema


class SchemaProvider(Protocol):
    """Fetches the sink table's schema (the reference's DESCRIBE TABLE,
    main.py:29-60). Called lazily; re-called on sink failure (drift)."""

    def fetch(self) -> TableSchema: ...


Sink = Callable[[DataFrame], None]

_OBS_UNSET = "unset"  # sink ran no action through the observed plan


def _observed_dlq_rows(obs: Observation):
    """Non-blocking read of the per-batch DLQ-count metric.

    ``Observation.get`` BLOCKS until the observed plan's first action
    — but a sink is any callable and may legitimately not run one
    (enqueue-only sinks, test doubles), which would hang the trigger
    forever. Peek at the JVM future instead. Returns an int count,
    ``_OBS_UNSET`` (no action ever ran — the caller should stop
    attaching observations for this job), or ``None`` (peek failed).

    The count is a TRUSTED LOWER BOUND, not an exact value: metrics
    reflect only the rows the sink's FIRST action streamed past
    CollectMetrics, and a perfectly reasonable sink may probe before
    writing (``if df.isEmpty(): return`` then write) — its limit-1
    probe finalizes the metric at 0 while the full write follows.
    Callers must treat ``> 0`` as proof of DLQ rows and ``0`` as
    UNKNOWN (re-probe), never as proof of emptiness."""
    try:
        jo = obs._jo
        if jo is None or not jo.future().isCompleted():
            return _OBS_UNSET
        return int(obs.get["dlq_rows"])
    except Exception:
        return None


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
        # False once a trigger proves the sink never acts through the
        # observed plan: each unconsumed Observation leaks one
        # ObservationManager entry JVM-side, so stop attaching them —
        # the job falls back to the isEmpty probe permanently
        self._observe_dlq = True

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
        from kafka2clickhouse_py_streamer_spark.pipeline.core import (
            split_tagged,
        )

        cache_raw = (
            os.environ.get("SPARK_GRAFT_BATCH_CACHE", "on") != "off"
        )
        if cache_raw:
            batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            work_df = self._fan_out(batch_df)
            tagged, typed, obs = self._process(work_df)
            try:
                dlq = None
                dlq_has_rows: bool | None = None
                n_dlq: int | None = None
                try:
                    self._sink(typed)
                    # a full-scan sink action streamed every tagged row
                    # past CollectMetrics — a POSITIVE count is then
                    # proof of DLQ rows with no extra Spark job. A zero
                    # stays UNKNOWN (a sink may probe-then-write; its
                    # limit-1 probe finalizes the metric early) and an
                    # unset metric marks a non-acting sink: disable
                    # observations for this job so unconsumed entries
                    # don't accumulate in the JVM ObservationManager.
                    if obs is not None:
                        observed = _observed_dlq_rows(obs)
                        if observed is _OBS_UNSET:
                            self._observe_dlq = False
                        elif isinstance(observed, int) and observed > 0:
                            n_dlq = observed
                            dlq_has_rows = True
                except Exception:
                    # schema drift suspected: re-fetch, re-process,
                    # retry once (main.py:433-445)
                    tagged.unpersist()
                    self.invalidate_schema()
                    tagged, typed, obs = self._process(work_df)
                    try:
                        self._sink(typed)
                    except Exception as exc:
                        # second failure → only the VALID rows go to
                        # the DLQ with the insert error; invalid rows
                        # keep their validation error (main.py:446-456)
                        valid_raw, dlq = split_tagged(
                            tagged, self._value_col
                        )
                        failed = valid_raw.select(
                            F.col(self._value_col).alias("row"),
                            F.lit(
                                f"insert failed after retry: {exc}"
                            ).alias("error"),
                        )
                        dlq = dlq.unionByName(failed)
                        # emptiness re-checked below: an all-tombstone
                        # batch has an empty union and must NOT invoke
                        # the DLQ sink with an empty frame
                # the DLQ frame is built lazily — a clean batch never
                # even constructs (or analyzes) it
                if dlq_has_rows is None:
                    if dlq is None:
                        _, dlq = split_tagged(tagged, self._value_col)
                    dlq_has_rows = not dlq.isEmpty()
                if dlq_has_rows:
                    if dlq is None:
                        _, dlq = split_tagged(tagged, self._value_col)
                    if n_dlq is not None and n_dlq <= 500_000:
                        # errors are the minority split by design —
                        # collapse the write to one task instead of
                        # |tagged partitions| tiny files + commits.
                        # repartition, NOT coalesce: coalesce(1) would
                        # pull the whole tagged scan onto one core
                        # (~10% on 250k-row bulk batches — 122.7k vs
                        # 136.1k steady in same-day recordings);
                        # the exchange only moves the filtered
                        # minority rows. n_dlq is a lower bound (a
                        # probe-then-write sink undercounts), so a
                        # pathological giant DLQ could collapse too —
                        # slow but correct; an exact-count sink (the
                        # normal case) keeps its width.
                        dlq = dlq.repartition(1)
                    self._dlq_sink(dlq)
            finally:
                tagged.unpersist()
        finally:
            batch_df.unpersist()

    def _fan_out(self, batch_df: DataFrame) -> DataFrame:
        """Spread a narrow micro-batch across cores before the
        validate/cast pipeline. The reference is single-threaded by
        construction; a 1-partition topic otherwise pins the engine to
        one core per trigger too (THROUGHPUT_r08's parity_1p regime —
        ~200 ms UDF + ~300 ms from_json + casts all serial). A local
        round-robin exchange of a 25 k-row batch costs ~100 ms and
        buys ~8x on the compute; rows have no order semantics here
        (the sink is set-oriented; DLQ rows carry their own payload).

        ``SPARK_GRAFT_BATCH_PARTS``: target partition count; ``0``
        disables; unset → min(defaultParallelism, 8). Batches already
        at least that wide are left alone. The explicit N keeps AQE
        from coalescing the tiny exchange back to one partition."""
        raw = os.environ.get("SPARK_GRAFT_BATCH_PARTS", "")
        if raw == "0":
            return batch_df
        try:
            target = int(raw) if raw else 0
        except ValueError:  # pragma: no cover - config error
            raise ValueError(f"bad SPARK_GRAFT_BATCH_PARTS: {raw!r}")
        if target <= 0:
            target = min(
                batch_df.sparkSession.sparkContext.defaultParallelism, 8
            )
        if batch_df.rdd.getNumPartitions() >= target:
            return batch_df
        return batch_df.repartition(target)

    def _process(self, batch_df: DataFrame):
        """(tagged persist, typed valid frame, DLQ-count Observation).

        Every Dataset op here is an EAGER analysis pass the streaming
        shell pays per trigger, so the pipeline is fused to six ops:
        tag → observe → filter → project-value → parse → cast-expand.
        The DLQ frame is NOT built here — run_batch derives it lazily
        from the plain tagged scan only when the observed count (or
        the retry path) says it is needed; it must not pass through
        the single-use CollectMetrics node."""
        from kafka2clickhouse_py_streamer_spark.pipeline.core import (
            dlq_condition,
            receiving_transform,
            tag_errors,
        )

        schema = self._get_schema()
        # persist the tagged frame: the validation UDF would otherwise
        # re-run for every downstream action (valid write, DLQ empty
        # check, DLQ write) — the reference validates each batch once
        # (main.py:428)
        tagged = tag_errors(batch_df, schema, self._value_col).persist()
        # count DLQ rows as an OBSERVED metric on the valid-write scan:
        # every tagged row flows past CollectMetrics before the valid
        # filter, so after a full-scan sink action a positive count is
        # already on the driver — no separate probe job. Skipped once
        # the sink proved non-acting (see _observe_dlq).
        if self._observe_dlq:
            obs = Observation()
            base = tagged.observe(
                obs, F.count(F.when(dlq_condition(), 1)).alias("dlq_rows")
            )
        else:
            obs, base = None, tagged
        valid = base.filter(F.col("_err").isNull()).select(
            self._value_col
        )
        # parse + cast Columns are cached per (app, schema, value_col):
        # triggers fire many times a second in the parity regime and
        # rebuilding the fragments was measurable driver fixed cost
        parse_col, cast_cols = receiving_transform(
            batch_df.sparkSession, schema, self._value_col
        )
        typed = valid.select(parse_col.alias("_parsed")).select(*cast_cols)
        return tagged, typed, obs

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
        same at-least-once contract) as the continuous service.

        AQE is disabled on the session by default: the foreachBatch
        body re-runs the same fixed, tiny plan every trigger, and
        AQE's stage-at-a-time scheduling adds ~200 ms per trigger for
        re-optimizations that can never change this plan (measured,
        THROUGHPUT_r09). An ingest service owns its session (the
        reference is a dedicated process, main.py:468), so the global
        conf is safe; set ``SPARK_GRAFT_INGEST_AQE=keep`` to leave the
        session untouched when sharing it with analytic queries."""
        if os.environ.get("SPARK_GRAFT_INGEST_AQE", "") != "keep":
            stream_df.sparkSession.conf.set(
                "spark.sql.adaptive.enabled", "false"
            )
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
