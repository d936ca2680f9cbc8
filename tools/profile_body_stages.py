"""Decompose the parity trigger's cache-build (count job) cost.

Batch-mode microbenchmark over one 25 k-row corpus file with the exact
session settings the ingest path uses (AQE off, cache compression
off): times scan, +fan-out exchange, +JSON decode, +validator UDF,
+persist+count, each median-of-7. Diagnostic only.

Run: python tools/profile_body_stages.py
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


def med(fn, reps=7):
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        samples.append((time.perf_counter() - t0) * 1000)
    samples.sort()
    return samples[reps // 2], samples[0], samples[-1]


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

    spark = get_spark(app_name="profile_body")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    schema = build_table_schema(
        tp.CH_COLUMNS,
        required_columns=["device_id", "event_ts"],
        string_enum_columns=["gps_validity", "incognito_mode"],
        datetime_columns=["event_ts", "event_date"],
    )

    work = tempfile.mkdtemp(prefix="profile_body_")
    try:
        intake = os.path.join(work, "i")
        tp.build_corpus(spark, intake, 25_000, 25_000, 1)
        src = spark.read.schema("value string, f long").parquet(intake).drop("f")

        # warm everything once (UDF workers, codegen)
        tag_errors(src.repartition(8), schema, "value").count()

        rows = [("scan only", lambda: src.count())]

        fan = src.repartition(8)
        rows.append(("scan+exchange", lambda: fan.count()))

        tagged_nofan = tag_errors(src, schema, "value")
        rows.append(("scan+tag (no fanout)", lambda: tagged_nofan.count()))

        tagged = tag_errors(fan, schema, "value")
        rows.append(("scan+exchange+tag", lambda: tagged.count()))

        def persist_count():
            t = tag_errors(fan, schema, "value").persist()
            t.select(
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(dlq_condition(), 1)).alias("d"),
            ).first()
            t.unpersist()

        rows.append(("scan+exchange+tag+persist+countjob", persist_count))

        def persist_then_read():
            t = tag_errors(fan, schema, "value").persist()
            t.select(
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(dlq_condition(), 1)).alias("d"),
            ).first()
            t.filter(F.col("_err").isNull()).count()  # cache re-read
            t.unpersist()

        rows.append(("... + one cache re-read", persist_then_read))

        for name, fn in rows:
            m, lo, hi = med(fn)
            print(f"  {name:38s} {m:8.1f}  [{lo:7.1f}, {hi:7.1f}]")

        # driver-side plan analysis cost of the tag (per-trigger)
        m, lo, hi = med(lambda: tag_errors(fan, schema, "value"), reps=7)
        print(f"  {'tag_errors plan build (driver)':38s} {m:8.1f}  "
              f"[{lo:7.1f}, {hi:7.1f}]")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
