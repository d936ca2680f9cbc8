"""Doc-vs-artifact consistency gate (round-4 verdict, What's-wrong #2).

Every per-query ratio/seconds quote in SCALE.md / ROUND*.md must match
a recorded bench artifact number, or carry an explicit "(unrecorded)"
marker. Second occurrence of this defect class made it structural:
tools/check_doc_metrics.py is the single implementation; this test
just runs it so CI fails on drift the same day it is written.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import check_doc_metrics


def test_doc_metric_quotes_match_artifacts():
    problems = check_doc_metrics.check()
    assert problems == [], "\n".join(problems)


def test_doc_counts_match_code():
    problems = check_doc_metrics.check_counts()
    assert problems == [], "\n".join(problems)


def test_quotes_resolve_against_committed_sidecar_history():
    """Round-8 regression: the driver's post-seal bench rerun overwrote
    BENCH_SPREAD.json in place, turning ROUND8.md's committed quotes
    red. The checker must resolve quotes against every committed
    version of the mutable sidecar, not just the working-tree file, so
    a rerun can never invalidate quotes that matched a recording."""
    versions = check_doc_metrics._committed_versions("BENCH_SPREAD.json")
    assert len(versions) >= 2, "expected multiple committed sidecar versions"
    p14 = {v.get("queries", {}).get("p14_span_scrub_pipeline") for v in versions}
    # both the pre-seal (3.775) and post-seal (3.829) r08 recordings
    # must be quotable — they live in different commits of one path
    assert {3.775, 3.829} <= p14, p14
