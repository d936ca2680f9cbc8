"""Custom stateful operator tests: running totals must accumulate
across micro-batches (exactly what a windowed agg cannot do)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from kafka2clickhouse_py_streamer_spark.streaming.stateful import (
    running_totals,
    streaming_packer,
)


def test_running_totals_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    stream = (
        spark.readStream.schema(
            StructType([StructField("value", StringType())])
        )
        .json(src)
        .select(
            F.get_json_object("value", "$.user_id").cast("long").alias("user_id"),
            F.get_json_object("value", "$.v").cast("double").alias("value"),
        )
    )
    batches: list[list] = []
    q = (
        running_totals(stream)
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _id: batches.append(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )

    def push(rows):
        n = sum(1 for _ in os.listdir(src))
        with open(os.path.join(src, f"b{n}.txt"), "w") as f:
            for r in rows:
                f.write(json.dumps({"value": json.dumps(r)}) + "\n")
        q.processAllAvailable()

    try:
        push([{"user_id": 1, "v": 2.0}, {"user_id": 1, "v": 3.0},
              {"user_id": 2, "v": 10.0}])
        push([{"user_id": 1, "v": 5.0}])
    finally:
        q.stop()

    state = {}
    for b in batches:
        for r in b:
            state[r.user_id] = (r.n_events, r.total_value)
    # lifetime totals survived the batch boundary
    assert state[1] == (3, 10.0)
    assert state[2] == (1, 10.0)
    # batch 2 emitted ONLY the touched key (update mode)
    assert [r.user_id for r in batches[-1]] == [1]


def test_streaming_packer_offsets_continue_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    stream = (
        spark.readStream.schema(
            StructType([StructField("value", StringType())])
        )
        .json(src)
        .select(
            F.get_json_object("value", "$.shard").cast("long").alias("shard"),
            F.get_json_object("value", "$.doc_id").cast("long").alias("doc_id"),
            F.get_json_object("value", "$.n").cast("long").alias("n_tokens"),
        )
    )
    batches: list[list] = []
    q = (
        streaming_packer(stream, budget=100)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: batches.append(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )

    def push(rows):
        n = sum(1 for _ in os.listdir(src))
        with open(os.path.join(src, f"b{n}.txt"), "w") as f:
            for r in rows:
                f.write(json.dumps({"value": json.dumps(r)}) + "\n")
        q.processAllAvailable()

    try:
        push([{"shard": 1, "doc_id": 1, "n": 60},
              {"shard": 1, "doc_id": 2, "n": 60},
              {"shard": 2, "doc_id": 3, "n": 10}])
        push([{"shard": 1, "doc_id": 4, "n": 30},
              {"shard": 2, "doc_id": 5, "n": 95}])
    finally:
        q.stop()

    rows = {r.doc_id: r for b in batches for r in b}
    # batch 1, shard 1: doc 1 at offset 0 (pack 0), doc 2 at 60 (pack 0,
    # spilling into pack 1 is the reader's concern — assignment is by
    # START position)
    assert (rows[1].stream_offset, rows[1].pack_id, rows[1].offset_in_pack) == (0, 0, 0)
    assert (rows[2].stream_offset, rows[2].pack_id, rows[2].offset_in_pack) == (60, 0, 60)
    # batch 2 continues shard 1 at 120 -> pack 1 offset 20: state
    # survived the micro-batch boundary
    assert (rows[4].stream_offset, rows[4].pack_id, rows[4].offset_in_pack) == (120, 1, 20)
    # shard 2 tracks its own offset independently
    assert (rows[3].stream_offset, rows[3].pack_id) == (0, 0)
    assert (rows[5].stream_offset, rows[5].pack_id, rows[5].offset_in_pack) == (10, 0, 10)
