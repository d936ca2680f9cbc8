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
