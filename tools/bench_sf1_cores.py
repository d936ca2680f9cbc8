#!/usr/bin/env python
"""sf1 CORE-SCALING leg (round-14 verdict next-round #4).

The sf0.1 driver bench's 8-vs-32-core ratios are ~1 for most queries
because at 600 k rows every wall is job-overhead-bound — that run can
not demonstrate parallel speedup, only fail to contradict it. This
tool times the heavy suite at sf1 ONLY (the bench_sf1 protocol: one
warm pass, median of 3, cache hygiene) under the AMBIENT
``SPARK_GRAFT_CPUS`` and writes ``BENCH_sf1_c{cpus}.json`` — run it
once at 32 and once at 8 and the pair is the measured core-scaling
evidence the plan-shape argument was missing.

The sf1 fixture must already exist (tools/bench_sf1.py generates it);
this tool never regenerates data and never touches BENCH_sf1.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_sf1 import HEAVY, SF1_DIR  # noqa: E402


def main() -> None:
    from kafka2clickhouse_py_streamer_spark.operators.base import all_queries
    from kafka2clickhouse_py_streamer_spark.session import get_spark

    if not os.path.exists(os.path.join(SF1_DIR, "documents.parquet")):
        raise SystemExit(
            f"sf1 fixture missing under {SF1_DIR} — run tools/bench_sf1.py"
        )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name=f"bench-sf1-c{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    import bench

    cal, shuf = bench.measure_anchors(spark)

    times: dict[str, float] = {}
    for name in HEAVY:
        fn = registry[name].fn
        spark.sparkContext.setJobDescription(f"sf1-c{cpus}:{name}")
        fn(spark, SF1_DIR).count()  # warm (plan + JIT + session caches)
        spark.catalog.clearCache()
        samples = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, SF1_DIR).count()
            samples.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        times[name] = round(sorted(samples)[1], 3)

    out = {
        "metric": "heavy_sf1_core_scaling_leg",
        "unit": "sec",
        "cpus": cpus,
        "host_calibration_sec": cal,
        "host_calibration_shuffle_sec": shuf,
        "sf1": times,
        "value": round(sum(times.values()), 3),
    }
    path = os.path.join(REPO, f"BENCH_sf1_c{cpus}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
