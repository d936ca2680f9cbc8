#!/usr/bin/env python
"""Per-query optimization probe (round 13): time individual registry
queries with the bench's own methodology (warm passes + median of N
with cache hygiene, count-action) and/or oracle-compare them at a
small scale — the measure/re-measure loop of the optimization round
without paying a full bench run per iteration.

Usage::

    python tools/probe_query.py time s24_triangle_count [reps=5]
    python tools/probe_query.py oracle s24_triangle_count p14_...
    SPARK_GRAFT_SF_DIR=... overrides the timing scale (default sf0.1);
    oracle checks always run at sf0.01 plus sf0.001 (both small SFs).
"""

from __future__ import annotations

import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)
sys.path.insert(0, os.path.join(REPO_DIR, "tests"))


def main() -> None:
    mode = sys.argv[1]
    names = [a for a in sys.argv[2:] if not a.startswith("reps=")]
    reps = next(
        (int(a.split("=")[1]) for a in sys.argv[2:] if a.startswith("reps=")),
        5,
    )

    from kafka2clickhouse_py_streamer_spark.operators.base import all_queries
    from kafka2clickhouse_py_streamer_spark.session import get_spark

    spark = get_spark(app_name=f"probe-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    if mode == "time":
        sf_dir = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        for name in names:
            fn = registry[name].fn
            spark.sparkContext.setJobDescription(f"probe:{name}")
            for _ in range(2):  # warm (bench protocol)
                fn(spark, sf_dir).count()
                spark.catalog.clearCache()
            samples = []
            for _ in range(reps):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            samples.sort()
            print(
                f"{name}: median {samples[reps // 2]:.3f}s "
                f"[{samples[0]:.3f}, {samples[-1]:.3f}] {len(samples)} reps"
            )
        return

    if mode == "oracle":
        from oracle_harness import compare, duckdb_conn

        ok = True
        for sf in ("0.01", "0.001"):
            sf_dir = f"/root/testdata/sf{sf}"
            con = duckdb_conn(sf_dir)
            for name in names:
                q = registry[name]
                if q.oracle is None:
                    print(f"{name}@sf{sf}: no oracle (rows-only)")
                    continue
                res = compare(q.fn(spark, sf_dir), con, q.oracle)
                green = (
                    res.get("count_match")
                    and res.get("cols_match")
                    and res.get("values_match", True)
                )
                ok &= bool(green)
                print(
                    f"{name}@sf{sf}: {'GREEN' if green else 'RED ' + str(res)}"
                    f" (rows {res['spark_rows']})"
                )
        sys.exit(0 if ok else 1)

    raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
