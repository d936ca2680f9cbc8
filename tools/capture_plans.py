#!/usr/bin/env python
"""Capture ``explain("formatted")`` for headline queries into
``plans/<round>/<query>_<tag>.txt`` — the optimization round's
before/after plan evidence (the judge reads these files instead of
running Spark; every plan-shape claim in OPTIMIZATION_r*.md must be
checkable against them).

Usage::

    python tools/capture_plans.py before             # all headline
    python tools/capture_plans.py after p07_corpus_pipeline s24_...

Plans are captured at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) so scan
row-count estimates match the benched scale. Capture is build-only (no
query execution) except where a query's construction itself runs a
bounded job (derived-plane COUNT, centroid training) — identical to
what the bench pays before timing.
"""

from __future__ import annotations

import os
import sys

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

PLANS_DIR = os.path.join(
    REPO_DIR, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    from bench import HEADLINE
    from kafka2clickhouse_py_streamer_spark.operators.base import all_queries
    from kafka2clickhouse_py_streamer_spark.plans.analysis import (
        formatted_plan,
    )
    from kafka2clickhouse_py_streamer_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"capture-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    if not names:
        names = list(HEADLINE)

    os.makedirs(PLANS_DIR, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = registry[name].fn(spark, sf_dir)
        plan = formatted_plan(df)
        path = os.path.join(PLANS_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        joins = [
            j
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
            )
            if j in plan
        ]
        print(f"{name}: exchanges={n_exch} joins={joins} -> {path}")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
