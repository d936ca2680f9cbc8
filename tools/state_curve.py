#!/usr/bin/env python
"""Recorded state-store size curves for the REAL Spark state-store
operators (HDFSBackedStateStore under watermarked streaming aggs and
dropDuplicatesWithinWatermark) — the other half of round 7's depth
artifact. The RAG soak (tools/streaming_soak.py) curves the repo's
CUSTOM parquet state; this tool curves Spark's own state store and
records the claim SCALE.md makes but never proved with a recording:
**state size is bounded by the watermark horizon, not stream length.**

Drive: 24 hourly micro-batch files (one event-time hour each, 1 file
per trigger) through

- ``tumbling_counts`` (1 h windows, 2 h watermark, append mode): state
  = windows the watermark has not yet closed — a constant ~3 windows x
  |event_type| regardless of how many hours stream by;
- ``dedup_within_watermark`` (2 h watermark): state = distinct keys
  the store still retains; each batch re-sends keys from the previous
  hour (inside the horizon → the one-sided guarantee says they MUST be
  dropped) and keys from 8 hours back — far beyond the store's
  RECORDED retention (the curve shows ~5 key-hours: watermark delay +
  eviction lag), so those are provably evicted and MUST be readmitted,
  proving eviction is real, not just a plateaued counter. The recorded
  retention is why 8 h: `dropDuplicatesWithinWatermark` only promises
  dedup WITHIN the gap; a first attempt re-sending from 3 h back was
  still absorbed by the 5-hour retention.

Per micro-batch, ``recentProgress.stateOperators`` yields
numRowsTotal / numRowsUpdated / numRowsRemoved / memoryUsedBytes. The
plateau verdict compares the middle third of the run to the final
third: bounded state means the final max is within tolerance of the
middle max while cumulative input keeps growing linearly.

Writes STATE_CURVE_r{N}.json. Not concurrent-safe with bench/probe/
mirror (same local[32] cores).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

BASE_TS = "2026-01-01 00:00:00"
EVENTS_PER_HOUR = 100
RESEND_PREV = 20   # duplicate keys from 1 hour back (inside horizon)
RESEND_OLD = 10    # keys from RESEND_OLD_HOURS back (evicted by then)
RESEND_OLD_HOURS = 8
N_TYPES = 5


def hour_rows(i: int) -> list[tuple]:
    """Deterministic events for hour ``i``: fresh ids, near-duplicates
    of hour i-1 (within the watermark), and re-sends of hour i-3 ids
    (beyond it)."""
    rows = []

    def ev(eid: int, minute: int, second: int):
        rows.append(
            (
                eid,
                f"type_{eid % N_TYPES}",
                float(eid % 7),
                f"{BASE_TS[:11]}{i:02d}:{minute:02d}:{second:02d}",
            )
        )

    for k in range(EVENTS_PER_HOUR):
        ev(i * EVENTS_PER_HOUR + k, (k * 7) % 60, (k * 13) % 60)
    if i >= 1:
        for k in range(RESEND_PREV):
            ev((i - 1) * EVENTS_PER_HOUR + k, 5 + k % 50, 30)
    if i >= RESEND_OLD_HOURS:
        for k in range(RESEND_OLD):
            ev((i - RESEND_OLD_HOURS) * EVENTS_PER_HOUR + k, 10 + k % 45, 45)
    return rows


def run_query(spark, src: str, ckpt: str, build, sink_name: str):
    """Start ``build(stream_df)`` against the pre-written files, one
    file per trigger, and return the per-batch stateOperators curve."""
    stream = (
        spark.readStream.schema(
            "event_id long, event_type string, value double, ts_str string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .selectExpr(
            "event_id",
            "event_type",
            "value",
            "CAST(ts_str AS TIMESTAMP) AS ts",
        )
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        progresses = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()
    curve = []
    for p in progresses:
        ops = p.get("stateOperators") or []
        if not ops:
            continue
        op = ops[0]
        curve.append(
            {
                "batch": p["batchId"],
                "input_rows": p.get("numInputRows", 0),
                "operator": op.get("operatorName"),
                "state_rows": op.get("numRowsTotal"),
                "rows_updated": op.get("numRowsUpdated"),
                "rows_removed": op.get("numRowsRemoved"),
                "state_bytes": op.get("memoryUsedBytes"),
            }
        )
    return curve


def plateau_verdict(curve: list[dict]) -> dict:
    """Bounded state = the final third's max state_rows stays within
    20% of the middle third's max while cumulative input grows."""
    n = len(curve)
    mid = [c["state_rows"] for c in curve[n // 3 : 2 * n // 3]]
    fin = [c["state_rows"] for c in curve[2 * n // 3 :]]
    input_mid = sum(c["input_rows"] for c in curve[: 2 * n // 3])
    input_fin = sum(c["input_rows"] for c in curve)
    bounded = max(fin) <= max(mid) * 1.2
    return {
        "mid_third_max_state_rows": max(mid),
        "final_third_max_state_rows": max(fin),
        "cumulative_input_mid": input_mid,
        "cumulative_input_final": input_fin,
        "state_bounded": bounded,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=7)
    ap.add_argument("--hours", type=int, default=24)
    args = ap.parse_args()

    from kafka2clickhouse_py_streamer_spark.session import get_spark
    from kafka2clickhouse_py_streamer_spark.streaming.watermark import (
        dedup_within_watermark,
        tumbling_counts,
    )

    spark = get_spark(app_name="state_curve", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    # keep every micro-batch's progress (default 100 is enough for 24,
    # but pin it so --hours can grow)
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(args.hours + 8),
    )

    work = tempfile.mkdtemp(prefix="state_curve_")
    src = os.path.join(work, "intake")
    os.makedirs(src)
    schema = "event_id long, event_type string, value double, ts_str string"
    for i in range(args.hours):
        spark.createDataFrame(hour_rows(i), schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    agg_curve = run_query(
        spark,
        src,
        os.path.join(work, "ckpt_agg"),
        lambda s: tumbling_counts(s, window="1 hour", watermark="2 hours"),
        "state_curve_agg",
    )
    dedup_curve = run_query(
        spark,
        src,
        os.path.join(work, "ckpt_dedup"),
        lambda s: dedup_within_watermark(
            s, keys=["event_id"], watermark="2 hours"
        ),
        "state_curve_dedup",
    )

    # the dedup stream's two-sided proof:
    # 1. total admitted = fresh + beyond-retention re-sends (the
    #    RESEND_OLD_HOURS-old keys come back; within-horizon re-sends
    #    never do);
    # 2. the one-sided CONTRACT directly: no key admitted twice within
    #    the watermark gap (any readmitted key's two event times must
    #    be > 2 h apart).
    admitted = spark.sql("select count(*) n from state_curve_dedup").first()[
        "n"
    ]
    expected = args.hours * EVENTS_PER_HOUR + max(
        0, args.hours - RESEND_OLD_HOURS
    ) * RESEND_OLD
    within_gap_dups = spark.sql(
        """
        SELECT count(*) n FROM (
          SELECT event_id
          FROM state_curve_dedup
          GROUP BY event_id
          HAVING count(*) > 1
             AND (unix_timestamp(max(ts)) - unix_timestamp(min(ts)))
                 <= 2 * 3600
        )
        """
    ).first()["n"]

    artifact = {
        "what": "Spark state-store size curves: watermarked tumbling "
                "agg + dropDuplicatesWithinWatermark over hourly "
                "micro-batches",
        "hours": args.hours,
        "events_per_hour_fresh": EVENTS_PER_HOUR,
        "resend_within_horizon": RESEND_PREV,
        "resend_beyond_horizon": RESEND_OLD,
        "agg_curve": agg_curve,
        "agg_verdict": plateau_verdict(agg_curve),
        "dedup_curve": dedup_curve,
        "dedup_verdict": plateau_verdict(dedup_curve),
        "dedup_admitted_rows": admitted,
        "dedup_expected_rows": expected,
        "dedup_readmission_exact": admitted == expected,
        "dedup_within_gap_duplicates": within_gap_dups,
    }
    ok = (
        artifact["agg_verdict"]["state_bounded"]
        and artifact["dedup_verdict"]["state_bounded"]
        and artifact["dedup_readmission_exact"]
        and within_gap_dups == 0
    )
    dest = os.path.join(REPO, f"STATE_CURVE_r{args.round:02d}.json")
    with open(dest, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(
        f"wrote {dest}: agg plateau "
        f"{artifact['agg_verdict']['final_third_max_state_rows']} rows, "
        f"dedup plateau "
        f"{artifact['dedup_verdict']['final_third_max_state_rows']} rows, "
        f"readmission {admitted}/{expected}, ok={ok}"
    )
    shutil.rmtree(work, ignore_errors=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
