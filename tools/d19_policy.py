#!/usr/bin/env python
"""Record the d19→d17 at-scale policy decision as an artifact.

Round-5 verdict item 4: d19 measures whether MinHash signatures + set
sizes alone (Broder's identity) can drive containment admission at
corpus scale; round 6 must CONSUME the measurement. This tool runs the
d19 calibration at sf0.01 and sf0.1 and records, per admission margin,
the recall/precision of signature-only admission against the exact
containment decision at CONTAINMENT_THRESHOLD — the numbers SCALE.md
§"d17 at 100 TB" quotes. Writes ``D19_CALIBRATION.json``.

The load-bearing finding (also pinned live by
``tests/test_llm_invariants.py::test_d19_admission_no_recall_loss``):
band-candidate selection biases the Jaccard estimate UPWARD, so the
derived containment estimate over-admits rather than under-admits —
admission at tau = CONTAINMENT_THRESHOLD loses zero measured recall
while shrinking the exact-verify set.

Run: python tools/d19_policy.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIRS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
MARGINS = (0.0, 0.05, 0.10, 0.15, 0.20)


def measure() -> dict:
    import pyspark.sql.functions as F

    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        CONTAINMENT_THRESHOLD,
        d19_containment_calibration,
    )
    from kafka2clickhouse_py_streamer_spark.session import get_spark

    spark = get_spark(app_name="d19_policy", shuffle_partitions=8)
    out: dict = {"threshold": CONTAINMENT_THRESHOLD, "sf": {}}
    for sf in SF_DIRS:
        df = d19_containment_calibration(spark, sf).cache()
        n = df.count()
        stats = df.agg(
            F.mean("abs_err").alias("mean"),
            F.expr("percentile(abs_err, 0.5)").alias("p50"),
            F.expr("percentile(abs_err, 0.95)").alias("p95"),
            F.max("abs_err").alias("max"),
        ).collect()[0]
        entry = {
            "pairs": n,
            "abs_err": {
                k: round(float(stats[k]), 4)
                for k in ("mean", "p50", "p95", "max")
            },
            "admission": [],
        }
        T = CONTAINMENT_THRESHOLD
        for margin in MARGINS:
            tau = round(T - margin, 2)
            r = df.agg(
                F.sum(F.when(F.col("containment") >= T, 1).otherwise(0)).alias("pos"),
                F.sum(
                    F.when(
                        (F.col("containment") >= T)
                        & (F.col("est_containment") >= tau),
                        1,
                    ).otherwise(0)
                ).alias("tp"),
                F.sum(
                    F.when(F.col("est_containment") >= tau, 1).otherwise(0)
                ).alias("admitted"),
            ).collect()[0]
            entry["admission"].append(
                {
                    "tau": tau,
                    "admitted": int(r["admitted"]),
                    "positives": int(r["pos"]),
                    "recall": round(r["tp"] / r["pos"], 4) if r["pos"] else None,
                    "precision": round(r["tp"] / r["admitted"], 4)
                    if r["admitted"]
                    else None,
                }
            )
        df.unpersist()
        out["sf"][os.path.basename(sf)] = entry
    head = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()
    out["git_head"] = head
    out["decision"] = (
        "signature-first admission at tau = CONTAINMENT_THRESHOLD "
        "(upward selection bias => zero measured recall loss at both "
        "SFs), exact verify only the admitted pairs; DF cap stays on "
        "the exact path"
    )
    return out


if __name__ == "__main__":
    art = measure()
    path = os.path.join(REPO, "D19_CALIBRATION.json")
    with open(path, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(f"wrote {path}")
    for sf, e in art["sf"].items():
        at_t = e["admission"][0]
        print(
            f"  {sf}: pairs={e['pairs']} recall@tau=T={at_t['recall']} "
            f"precision={at_t['precision']} admitted={at_t['admitted']}"
        )
