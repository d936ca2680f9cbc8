"""One-off per-stage profile of the parity_1p trigger body.

Times each phase of ``PipelineJob.run_batch`` (fan-out+tag build via
the count job, valid plan+write, DLQ write, unpersist) by wrapping the
job's internals, over the same corpus/shape as
``tools/ingest_throughput.py``'s parity_1p. Diagnostic only — prints a
table, writes nothing.

Run: python tools/profile_trigger.py [--rows 250000]
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=250_000)
    ap.add_argument("--batch", type=int, default=25_000)
    ap.add_argument("--parts", type=int, default=1)
    ap.add_argument("--committer-v2", action="store_true",
                    help="mapreduce.fileoutputcommitter.algorithm.version=2")
    ap.add_argument("--coalesce-valid", type=int, default=0,
                    help="coalesce the valid write to N tasks")
    ap.add_argument("--flat", action="store_true",
                    help="flat corpus files (no partitionBy subdirs)")
    ap.add_argument("--tmpfs-ckpt", action="store_true",
                    help="checkpoint dir on /dev/shm")
    ap.add_argument("--rowgroups", action="store_true",
                    help="small parquet row groups + small "
                         "maxPartitionBytes: source-level fan-out "
                         "(file twin of KAFKA_MIN_PARTITIONS)")
    args = ap.parse_args()

    from kafka2clickhouse_py_streamer_spark.schema.clickhouse import (
        build_table_schema,
    )
    from kafka2clickhouse_py_streamer_spark.session import get_spark
    from kafka2clickhouse_py_streamer_spark.streaming.job import (
        PipelineJob,
        StaticSchemaProvider,
    )

    spark = get_spark(app_name="profile_trigger")
    spark.sparkContext.setLogLevel("ERROR")
    schema = build_table_schema(
        tp.CH_COLUMNS,
        required_columns=["device_id", "event_ts"],
        string_enum_columns=["gps_validity", "incognito_mode"],
        datetime_columns=["event_ts", "event_date"],
    )

    work = tempfile.mkdtemp(prefix="profile_trigger_")
    shm_work = None
    timings: list[dict] = []
    try:
        intake = os.path.join(work, "intake")
        out = os.path.join(work, "out")
        dlq_dir = os.path.join(work, "dlq")
        if args.tmpfs_ckpt:
            shm_work = tempfile.mkdtemp(
                prefix="profile_trigger_", dir="/dev/shm"
            )
            ckpt = os.path.join(shm_work, "ckpt")
        else:
            ckpt = os.path.join(work, "ckpt")
        if args.committer_v2:
            spark.sparkContext._jsc.hadoopConfiguration().set(
                "mapreduce.fileoutputcommitter.algorithm.version", "2"
            )
        if args.rowgroups:
            # the parquet writer takes row-group size from the hadoop
            # conf; small groups make a single file splittable so the
            # STREAM scan fans out (file twin of KAFKA_MIN_PARTITIONS)
            spark.sparkContext._jsc.hadoopConfiguration().set(
                "parquet.block.size", str(256 * 1024)
            )
        tp.build_corpus(spark, intake, args.rows, args.batch, args.parts)
        if args.rowgroups:
            spark.conf.set("spark.sql.files.maxPartitionBytes",
                           str(256 * 1024))
            spark.conf.set("spark.sql.files.openCostInBytes", "0")
            os.environ["SPARK_GRAFT_BATCH_PARTS"] = "0"
        if args.flat:
            flat_dir = os.path.join(work, "intake_flat")
            os.makedirs(flat_dir)
            n = 0
            for sub in sorted(os.listdir(intake)):
                p = os.path.join(intake, sub)
                if not os.path.isdir(p):
                    continue
                for f in sorted(os.listdir(p)):
                    if f.endswith(".parquet"):
                        os.rename(os.path.join(p, f),
                                  os.path.join(flat_dir, f"{sub}-{f}"))
                        n += 1
            print(f"flattened {n} files")
            intake = flat_dir

        def timed_sink(df):
            t0 = time.perf_counter()
            df.write.mode("append").parquet(out)
            timings[-1]["valid_write"] = time.perf_counter() - t0

        def timed_dlq(df):
            t0 = time.perf_counter()
            df.write.mode("append").parquet(dlq_dir)
            timings[-1]["dlq_write"] = time.perf_counter() - t0

        job = PipelineJob(
            StaticSchemaProvider(schema), sink=timed_sink, dlq_sink=timed_dlq
        )

        orig_count = job._count_tagged
        orig_plan = job._plan_valid
        orig_run_batch = job.run_batch

        def count_tagged(tagged):
            t0 = time.perf_counter()
            r = orig_count(tagged)
            timings[-1]["count_job(cache build)"] = time.perf_counter() - t0
            return r

        def plan_valid(tagged):
            t0 = time.perf_counter()
            r = orig_plan(tagged)
            if args.coalesce_valid:
                r = r.coalesce(args.coalesce_valid)
            timings[-1]["plan_valid(lazy)"] = time.perf_counter() - t0
            return r

        def run_batch(batch_df, batch_id=0):
            timings.append({})
            t0 = time.perf_counter()
            orig_run_batch(batch_df, batch_id)
            timings[-1]["run_batch_total"] = time.perf_counter() - t0

        job._count_tagged = count_tagged
        job._plan_valid = plan_valid
        job.run_batch = run_batch

        if args.flat:
            stream = (
                spark.readStream.schema("value string")
                .option("maxFilesPerTrigger", args.parts)
                .parquet(intake)
            )
        else:
            stream = (
                spark.readStream.schema("value string, f long")
                .option("maxFilesPerTrigger", args.parts)
                .parquet(intake)
                .drop("f")
            )
        t0 = time.perf_counter()
        q = job.start(stream, ckpt, available_now=True)
        q.awaitTermination()
        wall = time.perf_counter() - t0

        steady = timings[2:] if len(timings) > 4 else timings
        keys = sorted({k for t in steady for k in t})
        print(f"\n{len(timings)} triggers, wall {wall:.2f}s; "
              f"steady medians over {len(steady)} triggers (ms):")
        for k in keys:
            vals = sorted(t[k] * 1000 for t in steady if k in t)
            med = vals[len(vals) // 2]
            print(f"  {k:28s} {med:8.1f}  "
                  f"[{vals[0]:7.1f}, {vals[-1]:7.1f}]")
        import json as _json
        progress = sorted(
            (p for p in (_json.loads(pr.json) for pr in q.recentProgress)
             if p["numInputRows"]),
            key=lambda p: p["batchId"],
        )[2:]
        agg: dict[str, list] = {}
        for p in progress:
            for k, v in p["durationMs"].items():
                agg.setdefault(k, []).append(v)
        print("streaming durationMs medians:")
        for k, vs in sorted(agg.items()):
            vs.sort()
            print(f"  {k:28s} {vs[len(vs)//2]:8.1f}  "
                  f"[{vs[0]:7.1f}, {vs[-1]:7.1f}]")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
