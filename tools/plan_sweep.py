#!/usr/bin/env python
"""Plan-shape sweep over the FULL registry (round 13): build every
query at the bench scale and record the physical-plan fingerprint —
exchange count, parquet-scan count, join strategies, Python row ops —
to ``plans/<round>/SWEEP.json`` (SPARK_GRAFT_PLANS_ROUND, default r14). The optimization round's
examined-every-operator checklist: a query whose plan holds many scans
of the same table is re-deriving a subtree per consumer (the s24
finding); joins/pythons flag strategy and boundary regressions.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


def main() -> None:
    from kafka2clickhouse_py_streamer_spark.operators.base import all_queries
    from kafka2clickhouse_py_streamer_spark.plans.analysis import (
        formatted_plan,
    )
    from kafka2clickhouse_py_streamer_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name, q in all_queries().items():
        try:
            plan = formatted_plan(q.fn(spark, sf_dir))
        except Exception as exc:  # pragma: no cover - sweep robustness
            out[name] = {"error": str(exc)[:200]}
            continue
        out[name] = {
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "scans": plan.count("Scan parquet"),
            "joins": sorted(
                {
                    j
                    for j in (
                        "BroadcastHashJoin",
                        "SortMergeJoin",
                        "ShuffledHashJoin",
                        "BroadcastNestedLoopJoin",
                        "CartesianProduct",
                    )
                    if j in plan
                }
            ),
            "python_ops": len(
                re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas", plan)
            ),
            "single_partition": "SinglePartition" in plan,
        }
    path = os.path.join(
        REPO_DIR, "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"), "SWEEP.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    flagged = sorted(
        (v.get("scans", 0), k) for k, v in out.items() if "error" not in v
    )[-15:]
    print(f"wrote {path} ({len(out)} queries)")
    print("most scans:", flagged)
    errs = {k: v for k, v in out.items() if "error" in v}
    if errs:
        print("ERRORS:", errs)


if __name__ == "__main__":
    main()
