"""Custom stateful operator tests: running totals must accumulate
across micro-batches (exactly what a windowed agg cannot do)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from kafka2clickhouse_py_streamer_spark.streaming.stateful import running_totals


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
