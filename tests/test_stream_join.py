"""Stream-stream join tests: matches within the time bound join;
too-late arrivals beyond the watermark+bound don't."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from kafka2clickhouse_py_streamer_spark.streaming.watermark import (
    stream_stream_join,
)

RAW = StructType([StructField("value", StringType())])


def _src(spark, path, ts_name):
    return (
        spark.readStream.schema(RAW)
        .json(path)
        .select(
            F.get_json_object("value", "$.user_id").cast("long").alias("user_id"),
            F.get_json_object("value", "$.ts").cast("timestamp").alias(ts_name),
            F.get_json_object("value", "$.tag").alias(
                "tag_l" if ts_name == "ts" else "tag_r"
            ),
        )
    )


def test_stream_stream_join_within_bound(spark, tmp_path):
    lsrc = str(tmp_path / "l")
    rsrc = str(tmp_path / "r")
    os.makedirs(lsrc)
    os.makedirs(rsrc)

    left = _src(spark, lsrc, "ts")
    right = _src(spark, rsrc, "ts_r")
    joined = stream_stream_join(left, right)

    batches: list[list] = []
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: batches.append(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )

    def push(src, n, rows):
        with open(os.path.join(src, f"b{n}.txt"), "w") as f:
            for r in rows:
                f.write(json.dumps({"value": json.dumps(r)}) + "\n")
        q.processAllAvailable()

    try:
        # click at 10:00, view 10 min later (within 30-min bound) and a
        # different user's view (no match)
        push(lsrc, 0, [{"user_id": 1, "ts": "2024-01-01 10:00:00", "tag": "click"}])
        push(rsrc, 0, [
            {"user_id": 1, "ts": "2024-01-01 10:10:00", "tag": "view"},
            {"user_id": 2, "ts": "2024-01-01 10:10:00", "tag": "view"},
        ])
        # view 2 hours later for the same user: outside the 30-min bound
        push(rsrc, 1, [{"user_id": 1, "ts": "2024-01-01 12:00:00", "tag": "late"}])
    finally:
        q.stop()

    rows = [r for b in batches for r in b]
    pairs = {(r.user_id, r.tag_l, r.tag_r) for r in rows}
    assert (1, "click", "view") in pairs
    assert all(t != "late" for _, _, t in pairs)
    assert all(u == 1 for u, _, _ in pairs)


def test_w05_streaming_twin_matches_batch(spark, tmp_path):
    """Batch-stream equivalence on the real fixture: the attribution
    join (equi key + event-time range, watermarks both sides) run live
    under readStream yields exactly the pairs the batch twin sees, and
    first-click reduction reproduces w05's output."""
    from kafka2clickhouse_py_streamer_spark.operators.base import table
    from kafka2clickhouse_py_streamer_spark.streaming.batch_windows import (
        w05_attribution,
    )

    sf = "/root/testdata/sf0.001"
    e = table(spark, sf, "events")
    src = str(tmp_path / "events_src")
    e.coalesce(1).write.mode("overwrite").parquet(src)

    es = spark.readStream.schema(e.schema).parquet(src)
    views = (
        es.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("u_v"),
            F.col("ts").alias("ts_v"),
        )
        .withWatermark("ts_v", "1 hour")
    )
    clicks = (
        es.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("u_c"),
            F.col("ts").alias("ts_c"),
        )
        .withWatermark("ts_c", "1 hour")
    )
    joined = views.join(
        clicks,
        (F.col("u_v") == F.col("u_c"))
        & (F.col("ts_c") >= F.col("ts_v"))
        & (F.col("ts_c") <= F.col("ts_v") + F.expr("INTERVAL 4 HOURS")),
    ).select(
        "view_id",
        "click_id",
        (F.unix_micros("ts_c") - F.unix_micros("ts_v")).alias("delta_us"),
    )

    batches: list[list] = []
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: batches.append(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt_w05"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    stream_pairs = {(r.view_id, r.click_id, r.delta_us) for b in batches for r in b}

    # first-click reduction of the streamed pairs == the batch operator
    first: dict[int, tuple] = {}
    for vid, cid, delta in stream_pairs:
        if vid not in first or (delta, cid) < (first[vid][1], first[vid][0]):
            first[vid] = (cid, delta)
    batch_rows = {
        (r.view_id, r.click_id, r.delta_us)
        for r in w05_attribution(spark, sf).collect()
    }
    assert {(v, c, d) for v, (c, d) in first.items()} == batch_rows
    assert len(stream_pairs) >= len(batch_rows)


def test_stream_stream_left_outer_emits_unmatched_after_watermark(
    spark, tmp_path
):
    """LEFT OUTER stream-stream join: a left event with no in-bound
    right partner must eventually emit with a NULL right side — but
    only after the watermark proves no partner can still arrive (the
    time bound is what makes the outer result FINAL). A matched pair
    must emit exactly as in the inner join."""
    lsrc = str(tmp_path / "l")
    rsrc = str(tmp_path / "r")
    os.makedirs(lsrc)
    os.makedirs(rsrc)

    left = _src(spark, lsrc, "ts")
    right = _src(spark, rsrc, "ts_r")
    joined = stream_stream_join(left, right, how="left_outer")

    batches: list[list] = []
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: batches.append(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
        .start()
    )

    def push(src, n, rows):
        with open(os.path.join(src, f"b{n}.txt"), "w") as f:
            for r in rows:
                f.write(json.dumps({"value": json.dumps(r)}) + "\n")
        q.processAllAvailable()

    try:
        # user 1: click with an in-bound view (matched);
        # user 3: click with NO partner ever (must emit with NULLs)
        push(lsrc, 0, [
            {"user_id": 1, "ts": "2024-01-01 10:00:00", "tag": "click"},
            {"user_id": 3, "ts": "2024-01-01 10:00:00", "tag": "lonely"},
        ])
        push(rsrc, 0, [
            {"user_id": 1, "ts": "2024-01-01 10:10:00", "tag": "view"},
        ])
        # advance BOTH watermarks far past 10:00 + watermark + bound so
        # the unmatched left row becomes provably final
        push(lsrc, 1, [
            {"user_id": 9, "ts": "2024-01-01 15:00:00", "tag": "advance"},
        ])
        push(rsrc, 1, [
            {"user_id": 9, "ts": "2024-01-01 15:00:00", "tag": "advance"},
        ])
        # one more tick so the state store finalizes eviction
        push(lsrc, 2, [
            {"user_id": 9, "ts": "2024-01-01 16:00:00", "tag": "advance2"},
        ])
        push(rsrc, 2, [
            {"user_id": 9, "ts": "2024-01-01 16:00:00", "tag": "advance2"},
        ])
    finally:
        q.stop()

    rows = [r for b in batches for r in b]
    trios = {(r.user_id, r.tag_l, r.tag_r) for r in rows}
    assert (1, "click", "view") in trios          # matched pair
    assert (3, "lonely", None) in trios           # unmatched -> NULLs


def _push_rows(q, src, n, rows):
    """Shared micro-batch pusher for the stream-join tests: write one
    json-lines file and drain the stream."""
    with open(os.path.join(src, f"b{n}.txt"), "w") as f:
        for r in rows:
            f.write(json.dumps({"value": json.dumps(r)}) + "\n")
    q.processAllAvailable()


def test_stream_stream_full_outer_unmatched_right_key_survives(
    spark, tmp_path
):
    """FULL OUTER stream-stream join: an unmatched RIGHT event must
    emit with a NULL left side AND a non-null key — this exercises the
    coalesce(lw[key], rw[key]) path where the LEFT key is NULL, the
    branch the outer rewrite exists for (left_outer alone never runs
    it)."""
    lsrc = str(tmp_path / "l")
    rsrc = str(tmp_path / "r")
    os.makedirs(lsrc)
    os.makedirs(rsrc)

    left = _src(spark, lsrc, "ts")
    right = _src(spark, rsrc, "ts_r")
    joined = stream_stream_join(left, right, how="full_outer")

    batches: list[list] = []
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: batches.append(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt_full"))
        .start()
    )
    try:
        # user 1 matches; user 5's view arrives on the RIGHT with no
        # left partner ever
        _push_rows(q, lsrc, 0, [
            {"user_id": 1, "ts": "2024-01-01 10:00:00", "tag": "click"},
        ])
        _push_rows(q, rsrc, 0, [
            {"user_id": 1, "ts": "2024-01-01 10:10:00", "tag": "view"},
            {"user_id": 5, "ts": "2024-01-01 10:10:00", "tag": "orphan"},
        ])
        # advance both watermarks far past the bound, twice, so the
        # unmatched rows become provably final and evict
        for n, t in ((1, "15:00:00"), (2, "16:00:00")):
            _push_rows(q, lsrc, n, [
                {"user_id": 9, "ts": f"2024-01-01 {t}", "tag": "adv"},
            ])
            _push_rows(q, rsrc, n, [
                {"user_id": 9, "ts": f"2024-01-01 {t}", "tag": "adv"},
            ])
    finally:
        q.stop()

    rows = [r for b in batches for r in b]
    trios = {(r.user_id, r.tag_l, r.tag_r) for r in rows}
    assert (1, "click", "view") in trios
    # unmatched right row: key taken from the RIGHT side, left NULL
    assert (5, None, "orphan") in trios
