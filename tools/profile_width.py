"""Same-session, interleaved A/B of the count-job cost vs fan-out
width (the per-task Arrow-UDF fixed cost vs per-row compute tradeoff).
Interleaves variants round-robin so host drift hits all widths
equally. Diagnostic only. Run: python tools/profile_width.py
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

spec = importlib.util.spec_from_file_location(
    "ingest_throughput", os.path.join(REPO, "tools", "ingest_throughput.py")
)
tp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(tp)


def main() -> None:
    from pyspark.sql import functions as F

    from kafka2clickhouse_py_streamer_spark.pipeline.core import (
        dlq_condition,
        tag_errors,
    )
    from kafka2clickhouse_py_streamer_spark.schema.clickhouse import (
        build_table_schema,
    )
    from kafka2clickhouse_py_streamer_spark.session import get_spark

    spark = get_spark(app_name="profile_width")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    schema = build_table_schema(
        tp.CH_COLUMNS,
        required_columns=["device_id", "event_ts"],
        string_enum_columns=["gps_validity", "incognito_mode"],
        datetime_columns=["event_ts", "event_date"],
    )
    count_cols = [
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(dlq_condition(), 1)).alias("d"),
    ]

    work = tempfile.mkdtemp(prefix="profile_width_")
    try:
        intake = os.path.join(work, "i")
        tp.build_corpus(spark, intake, 25_000, 25_000, 1)
        src = (
            spark.read.schema("value string, f long").parquet(intake).drop("f")
        )
        widths = [1, 2, 4, 8, 16]
        frames = {w: src.repartition(w) if w > 1 else src for w in widths}
        for w in widths:  # warm
            t = tag_errors(frames[w], schema, "value").persist()
            t.select(*count_cols).first()
            t.unpersist()

        samples: dict[int, list[float]] = {w: [] for w in widths}
        split_cost: dict[int, list[float]] = {w: [] for w in widths}
        REPS = 9
        for _ in range(REPS):
            for w in widths:
                t0 = time.perf_counter()
                t = tag_errors(frames[w], schema, "value").persist()
                t.select(*count_cols).first()
                samples[w].append((time.perf_counter() - t0) * 1000)
                # post-cache read cost (what the writes pay)
                t0 = time.perf_counter()
                t.filter(F.col("_err").isNull()).count()
                split_cost[w].append((time.perf_counter() - t0) * 1000)
                t.unpersist()
        print("width  countjob_med [lo, hi]      cache_reread_med")
        for w in widths:
            s = sorted(samples[w])
            r = sorted(split_cost[w])
            print(
                f"  {w:2d}   {s[len(s)//2]:8.1f} [{s[0]:7.1f}, {s[-1]:7.1f}]"
                f"   {r[len(r)//2]:8.1f}"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
