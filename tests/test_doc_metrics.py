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


def test_window_composition_claims_match_artifacts():
    """Round-9 verdict finding #1: a round doc claimed four queries
    'head the r09 window' while the committed rotation had them at
    positions 64-67 and CORRECTNESS_r09 recorded none of them. Window
    composition claims are now checked against the artifact (sealed
    CORRECTNESS file, or the committed _VERIFY_FIRST head for the
    round in progress), so round notes can't contradict committed
    rotation state again."""
    problems = check_doc_metrics.check_window_claims()
    assert problems == [], "\n".join(problems)


def test_window_claim_checker_is_not_vacuous(tmp_path):
    """An over-narrow regex that skips every sentence would green
    trivially — feed the checker the exact round-9 false claim (keys
    that were NOT in CORRECTNESS_r09) and require it to flag it, plus
    a wrapped true claim it must accept."""
    false_doc = tmp_path / "ROUND9.md"
    false_doc.write_text(
        "## 1. Rotation\n\n"
        "The four r04-evidence queries q01/q06/q12/q13 and the\n"
        "35-query r05 block head the r09 window.\n"
    )
    problems = check_doc_metrics.check_window_claims([str(false_doc)])
    assert len(problems) == 1 and "q01" in problems[0], problems

    true_doc = tmp_path / "ROUND4.md"
    true_doc.write_text(
        "The 5 r01-only rows (d01/d02/d03/q36/q37) head\n"
        "the round-4 driver window.\n"
    )
    assert check_doc_metrics.check_window_claims([str(true_doc)]) == []


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


def test_headline_citation_enforced():
    """Round-10 verdict item 4: the latest round note (round >= 11)
    must quote BOTH the tracked sf0.1 sidecar median and the latest
    driver headline — one number alone cherry-picks whichever run
    looked better that round."""
    problems = check_doc_metrics.check_headline_citation()
    assert problems == [], "\n".join(problems)


def test_baseline_gate_quoted():
    """Round-12 verdict order 2: once BASELINE_SUBSET.json exists, the
    latest round note must quote the anchor-normalized baseline-gate
    ratio (a value tools/baseline_gate.py computes from a recorded
    anchored sidecar) with the matching PASS/FAIL verdict — the gate
    as a computed boolean, not an interpretation."""
    problems = check_doc_metrics.check_baseline_gate()
    assert problems == [], "\n".join(problems)
