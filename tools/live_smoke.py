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

1. produces N_ROWS valid JSON rows (plus 2 deliberately invalid ones
   when a DLQ topic is set) to KAFKA_TOPIC via Spark's batch Kafka sink;
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

    # 1. produce: N valid rows keyed by a unique run id, + 2 invalid
    #    (schema-violating) rows if DLQ routing is to be checked
    run_id = uuid.uuid4().hex
    schema = pick_schema_provider(spark, cfg).fetch()
    sample_cols = [c.name for c in schema.columns][:3]
    rows = [
        json.dumps(
            {sample_cols[0]: i, "run_id": run_id}
            | {c: f"v{i}" for c in sample_cols[1:]}
        )
        for i in range(n_rows)
    ]
    if cfg.dlq_topic:
        rows += ["{not json", json.dumps({"unexpected": "shape"})]
    (
        spark.createDataFrame([(r,) for r in rows], "value string")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", cfg.kafka_bootstrap_servers)
        .option("topic", cfg.kafka_topic)
        .save()
    )
    print(f"produced {len(rows)} rows to {cfg.kafka_topic}")

    # 2. run the production wiring, bounded: same builder as runner.main
    #    but catch-up trigger + fresh checkpoint + earliest offsets
    ckpt = tempfile.mkdtemp(prefix="live-smoke-ckpt-")
    bounded = dataclasses.replace(
        cfg, starting_offsets="earliest", checkpoint_dir=ckpt
    )
    query = build_query(spark, bounded, available_now=True)
    query.awaitTermination()
    print("pipeline drained (AvailableNow)")

    # 3. read the sink back and count
    sunk = (
        spark.read.format("jdbc")
        .option("url", cfg.sink_url)
        .option("dbtable", cfg.sink_table)
        .load()
    )
    got = sunk.count()
    assert got >= n_rows, f"sink has {got} rows, expected >= {n_rows}"
    print(f"sink row count ok: {got} >= {n_rows}")

    # 4. DLQ round-trip
    if cfg.dlq_topic:
        dlq = (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", cfg.kafka_bootstrap_servers)
            .option("subscribe", cfg.dlq_topic)
            .option("startingOffsets", "earliest")
            .load()
            .select(F.col("value").cast("string").alias("value"))
        )
        n_dlq = dlq.filter(F.col("value").contains("error")).count()
        assert n_dlq >= 2, f"DLQ has {n_dlq} error records, expected >= 2"
        print(f"DLQ routing ok: {n_dlq} error records")

    # NOTE on S1 at-least-once: re-running this script with the SAME
    # checkpoint dir must not re-insert (offsets committed); with a
    # fresh checkpoint it re-reads from earliest — that duplication is
    # the documented at-least-once contract, not a bug.
    print("LIVE SMOKE PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
