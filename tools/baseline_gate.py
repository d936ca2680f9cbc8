#!/usr/bin/env python
"""Evaluate the 2× baseline gate as a computed boolean.

The gate (BASELINE.md, anchor-normalized from round 13): a recording's
r01-subset wall divided by ITS OWN same-run codegen anchor, compared
to the re-based ``BASELINE_SUBSET.json`` normalized value —

    ratio = (subset_wall / host_calibration_sec) / base_normalized
    gate  = ratio <= 2.0

Host speed cancels by construction: both numerator legs come from one
session, so a 1.9× slower driver host (the round-12 adjudication
problem — driver 2.33× vs same-HEAD seal 1.67× on raw walls) moves
wall and anchor together and the ratio stays a CODE signal.

A recording is evaluable iff it carries all 11 subset query walls AND
``host_calibration_sec`` from the same run — i.e. any bench.py sidecar
(BENCH_SPREAD.json, committed or working-tree). Driver BENCH_r*.json
stdout captures carry no anchor; their gate reading is the sidecar the
same run wrote.

Usage:
    python tools/baseline_gate.py [recording.json ...]
        default: BENCH_SPREAD.json
Prints one JSON line per recording; exits 1 if any evaluable recording
breaches the gate (missing-anchor recordings are reported, not
breaching — they are not evaluable, which is the defect this gate
replaces, so they also exit 1 to force anchored recordings).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GATE = 2.0
BASE_PATH = os.path.join(REPO, "BASELINE_SUBSET.json")


def subset_names() -> list[str]:
    import bench

    return list(bench.R01_SUBSET)


def evaluate(recording: dict, base: dict) -> dict:
    """Gate verdict for one recording dict against the re-based
    baseline. Accepts bench sidecar shape (queries +
    host_calibration_sec at top level) or a driver wrap ({"parsed":
    {...}} — anchor-less, reported as not evaluable)."""
    body = recording.get("parsed") or recording
    qs = body.get("queries") or {}
    cal = body.get("host_calibration_sec")
    names = subset_names()
    missing = [n for n in names if n not in qs]
    if missing:
        return {"evaluable": False, "reason": f"missing subset queries: {missing}"}
    subset_wall = round(sum(qs[n] for n in names), 3)
    if not isinstance(cal, (int, float)) or not cal:
        return {
            "evaluable": False,
            "subset_wall_sec": subset_wall,
            "reason": "no host_calibration_sec in recording "
                      "(anchor-less recordings cannot be adjudicated)",
        }
    normalized = round(subset_wall / cal, 2)
    ratio = round(normalized / base["normalized"], 2)
    return {
        "evaluable": True,
        "subset_wall_sec": subset_wall,
        "host_calibration_sec": cal,
        "normalized": normalized,
        "base_normalized": base["normalized"],
        "ratio": ratio,
        "gate": GATE,
        "within_gate": ratio <= GATE,
    }


def main() -> None:
    base = json.load(open(BASE_PATH))
    paths = sys.argv[1:] or [os.path.join(REPO, "BENCH_SPREAD.json")]
    ok = True
    for p in paths:
        verdict = evaluate(json.load(open(p)), base)
        verdict["recording"] = os.path.relpath(p, REPO)
        print(json.dumps(verdict))
        if not verdict.get("within_gate", False):
            ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
