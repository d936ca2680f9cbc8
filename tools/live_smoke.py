#!/usr/bin/env python
"""Env-gated LIVE integration smoke: Kafka → PipelineJob → warehouse.

The sandbox has no Kafka broker or ClickHouse, so the S1 source and K1
sink are construction-only in CI; their *semantics* are tested through
file/memory twins (tests/test_streaming.py). This script is the missing
deployment checklist: run it against real infrastructure to prove the
exact production wiring end-to-end.

Requires (refuses to run otherwise — it is deliberately NOT a pytest):

    KAFKA_BOOTSTRAP_SERVERS   e.g. broker:9092
    KAFKA_TOPIC               an EMPTY topic the script may write to
    KAFKA_DLQ_TOPIC           optional; DLQ routing checked when set
    SINK_URL                  JDBC URL (e.g. jdbc:clickhouse://ch:8123/db
                              ?async_insert=1&wait_for_async_insert=1)
    SINK_TABLE                target table; must already exist
    SINK_SCHEMA_SOURCE        "describe" to exercise the live DESCRIBE
                              TABLE provider (S2); else SINK_COLUMNS
    N_ROWS                    optional, default 100

What it does:

1. produces N_ROWS valid JSON rows typed from the sink schema (plus
   deliberately schema-violating ones when a DLQ topic is set) to
   KAFKA_TOPIC via Spark's batch Kafka sink;
2. runs the production PipelineJob (same wiring as runner.build_query)
   with Trigger.AvailableNow from ``earliest``, so the run is bounded;
3. reads the sink table back over JDBC and asserts >= N_ROWS rows
   arrived (at-least-once: replays may add duplicates, never drop);
4. when a DLQ topic is set, reads it back and asserts the invalid rows
   landed there with error strings.

Exit 0 = the full checklist passed.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import tempfile
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REQUIRED = ("KAFKA_BOOTSTRAP_SERVERS", "KAFKA_TOPIC", "SINK_URL", "SINK_TABLE")


def build_probe_rows(
    schema, n_rows: int, with_dlq: bool, run_id: str = "smoke"
) -> tuple[list[str], int]:
    """(json rows, #dlq probes): N schema-typed valid rows, plus rows
    that genuinely violate the schema when ``with_dlq``.

    Valid values follow each column's json_type (hard-coding types by
    position fails on any schema whose first column isn't an integer).
    A DLQ probe must ACTUALLY violate the schema: wrong type on a
    non-string column, or a missing REQUIRED column — malformed JSON is
    not a probe (the validator silently drops it, main.py:519 parity),
    and unknown extra keys pass validation. A schema of only optional
    strings accepts everything; no probe exists then.

    Module-level (not inline in main) so the routing contract is
    testable offline through the same pipeline core the job runs.
    """

    def value_for(col, i: int):
        if col.is_datetime:
            return "2024-01-01 00:00:00"
        if col.json_type == "integer":
            return i
        if col.json_type == "number":
            return i + 0.5
        return f"v{i}-{run_id[:8]}"

    rows = [
        json.dumps({c.name: value_for(c, i) for c in schema.columns})
        for i in range(n_rows)
    ]
    n_dlq_probes = 0
    if with_dlq:
        typed = [
            c for c in schema.columns
            if c.json_type in ("integer", "number") and not c.is_datetime
        ]
        if typed:
            bad = {c.name: value_for(c, 0) for c in schema.columns}
            bad[typed[0].name] = "not-a-number"
            rows.append(json.dumps(bad))
            n_dlq_probes += 1
        if schema.required:
            bad = {
                c.name: value_for(c, 1)
                for c in schema.columns
                if c.name != schema.required[0]
            }
            rows.append(json.dumps(bad))
            n_dlq_probes += 1
    return rows, n_dlq_probes


def main() -> int:
    missing = [v for v in REQUIRED if not os.environ.get(v)]
    if missing:
        print(f"SKIP: live smoke needs env {missing} (no live infra here)")
        return 0

    from pyspark.sql import functions as F

    from kafka2clickhouse_py_streamer_spark.config import JobConfig
    from kafka2clickhouse_py_streamer_spark.runner import (
        build_query,
        pick_schema_provider,
    )
    from kafka2clickhouse_py_streamer_spark.session import get_spark

    n_rows = int(os.environ.get("N_ROWS", "100"))
    cfg = JobConfig.from_env()
    spark = get_spark(app_name="live-smoke")
    spark.sparkContext.setLogLevel("WARN")

    # 1. produce schema-typed valid rows + genuine DLQ probes
    schema = pick_schema_provider(spark, cfg).fetch()
    rows, n_dlq_probes = build_probe_rows(
        schema, n_rows, with_dlq=bool(cfg.dlq_topic), run_id=uuid.uuid4().hex
    )
    if cfg.dlq_topic and not n_dlq_probes:
        print(
            "note: sink schema is all-optional strings — no "
            "schema-violating probe exists; DLQ check skipped"
        )
    (
        spark.createDataFrame([(r,) for r in rows], "value string")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", cfg.kafka_bootstrap_servers)
        .option("topic", cfg.kafka_topic)
        .save()
    )
    print(f"produced {len(rows)} rows to {cfg.kafka_topic}")

    # Snapshot the sink BEFORE the run: a pre-populated table must not
    # make the post-run count check pass vacuously — assert the DELTA
    # this run inserted, not the absolute row count.
    def sink_count() -> int:
        return (
            spark.read.format("jdbc")
            .option("url", cfg.sink_url)
            .option("dbtable", cfg.sink_table)
            .load()
            .count()
        )

    before = sink_count()

    # 2. run the production wiring, bounded: same builder as runner.main
    #    but catch-up trigger + fresh checkpoint + earliest offsets
    ckpt = tempfile.mkdtemp(prefix="live-smoke-ckpt-")
    bounded = dataclasses.replace(
        cfg, starting_offsets="earliest", checkpoint_dir=ckpt
    )
    query = build_query(spark, bounded, available_now=True)
    query.awaitTermination()
    print("pipeline drained (AvailableNow)")

    # 3. read the sink back and count THIS run's insertions. The topic
    #    is required empty but the sink table is not; at-least-once
    #    allows delta > produced-valid-rows, never less.
    n_valid = len(rows) - n_dlq_probes
    got = sink_count() - before
    assert got >= n_valid, (
        f"sink grew by {got} rows this run, expected >= {n_valid}"
    )
    print(f"sink delta ok: +{got} >= {n_valid} (pre-run rows: {before})")

    # 4. DLQ round-trip (only when a real schema-violating probe went)
    if cfg.dlq_topic and n_dlq_probes:
        dlq = (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", cfg.kafka_bootstrap_servers)
            .option("subscribe", cfg.dlq_topic)
            .option("startingOffsets", "earliest")
            .load()
            .select(F.col("value").cast("string").alias("value"))
        )
        n_dlq = dlq.filter(F.col("value").contains("error")).count()
        assert n_dlq >= n_dlq_probes, (
            f"DLQ has {n_dlq} error records, expected >= {n_dlq_probes}"
        )
        print(f"DLQ routing ok: {n_dlq} error records")

    # NOTE on S1 at-least-once: re-running this script with the SAME
    # checkpoint dir must not re-insert (offsets committed); with a
    # fresh checkpoint it re-reads from earliest — that duplication is
    # the documented at-least-once contract, not a bug.
    print("LIVE SMOKE PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
