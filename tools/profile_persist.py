"""Why does persisting the 25 k-row tagged frame cost ~390 ms?

Times the count-job shape under different materialization strategies.
Diagnostic only. Run: python tools/profile_persist.py
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
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from kafka2clickhouse_py_streamer_spark.pipeline.core import (
        dlq_condition,
        tag_errors,
    )
    from kafka2clickhouse_py_streamer_spark.schema.clickhouse import (
        build_table_schema,
    )
    from kafka2clickhouse_py_streamer_spark.session import get_spark

    spark = get_spark(app_name="profile_persist")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    schema = build_table_schema(
        tp.CH_COLUMNS,
        required_columns=["device_id", "event_ts"],
        string_enum_columns=["gps_validity", "incognito_mode"],
        datetime_columns=["event_ts", "event_date"],
    )

    work = tempfile.mkdtemp(prefix="profile_persist_")
    try:
        intake = os.path.join(work, "i")
        tp.build_corpus(spark, intake, 25_000, 25_000, 1)
        src = (
            spark.read.schema("value string, f long").parquet(intake).drop("f")
        )
        fan = src.repartition(8)
        tag_errors(fan, schema, "value").count()  # warm

        count_cols = [
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(dlq_condition(), 1)).alias("d"),
        ]

        def run(level=None, batch_size=None, reread=True):
            def fn():
                if batch_size is not None:
                    spark.conf.set(
                        "spark.sql.inMemoryColumnarStorage.batchSize",
                        str(batch_size),
                    )
                t = tag_errors(fan, schema, "value")
                t = t.persist(level) if level else t.persist()
                t.select(*count_cols).first()
                if reread:
                    t.filter(F.col("_err").isNull()).count()
                t.unpersist()
            return fn

        print("count job + 1 cache re-read under persist variants (ms):")
        for name, fn in [
            ("default (MEMORY_AND_DISK_DESER)", run()),
            ("MEMORY_ONLY", run(StorageLevel.MEMORY_ONLY)),
            ("DISK_ONLY", run(StorageLevel.DISK_ONLY)),
            ("batchSize=1000", run(batch_size=1000)),
            ("batchSize=100000", run(batch_size=100000)),
        ]:
            m, lo, hi = med(fn)
            print(f"  {name:34s} {m:8.1f}  [{lo:7.1f}, {hi:7.1f}]")
        spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "10000")

        def no_persist():
            t = tag_errors(fan, schema, "value")
            t.select(*count_cols).first()
            t.filter(F.col("_err").isNull()).count()  # UDF re-runs

        m, lo, hi = med(no_persist)
        print(f"  {'NO persist (UDF runs twice)':34s} {m:8.1f}  "
              f"[{lo:7.1f}, {hi:7.1f}]")

        def local_ckpt():
            t = tag_errors(fan, schema, "value").localCheckpoint(eager=True)
            t.select(*count_cols).first()
            t.filter(F.col("_err").isNull()).count()

        m, lo, hi = med(local_ckpt)
        print(f"  {'localCheckpoint (RDD ser)':34s} {m:8.1f}  "
              f"[{lo:7.1f}, {hi:7.1f}]")

        # persist ONLY the minority columns? tagged is (value, _err) —
        # both needed downstream. Instead: Arrow round trip of the
        # whole frame into the driver and back would be the wrong
        # shape at scale; skip.

        # how large is the cached frame?
        t = tag_errors(fan, schema, "value").persist()
        t.count()
        for rdd_info in spark.sparkContext._jsc.sc().getRDDStorageInfo():
            print(
                f"  cached: {rdd_info.memSize()} bytes mem, "
                f"{rdd_info.diskSize()} bytes disk, "
                f"{rdd_info.numCachedPartitions()} partitions"
            )
        t.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
