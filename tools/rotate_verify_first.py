#!/usr/bin/env python
"""Emit (and optionally write) the next round's ``_VERIFY_FIRST`` list.

The differential-check harness records correctness rows for roughly the
first 50 entries of ``queries()`` per round, so the registry is ordered
stalest-evidence-first (``operators/base.py``). This tool derives the
rotation mechanically from the recorded evidence so it can't under-shoot
the window the way a hand-maintained list did in rounds 1-3 (the judge
found 5 queries whose only green row was r01 while their files churned):

priority order
  1. never green in any ``CORRECTNESS_r*.json``, or errored in the
     latest round they appeared;
  2. every other query by (last-green round ASC, churned-before-
     unchurned, registry position): age of the driver evidence is the
     PRIMARY key, so the absolute-stalest greens always head the
     window; whether the defining file churned since that green
     (``git diff --name-only`` against the commit that added that
     round's CORRECTNESS file) only breaks ties WITHIN a round.

     Round-9 verdict find: the previous ordering put ALL churned
     greens (category) ahead of ALL unchurned greens regardless of
     age, so whenever churn alone overfilled the ~50-row window the
     stalest-evidence queries (q01/q06/q12/q13, green r04) were
     mechanically starved round after round. Age-primary interleave
     makes starvation impossible: a query's wait is bounded by the
     count of strictly-older evidence, which shrinks every round.

Usage:
    python tools/rotate_verify_first.py            # print the list
    python tools/rotate_verify_first.py --write    # splice into base.py

``tests/test_rotation.py`` asserts the committed list matches this
tool's output and that every registry query is at most one round from
its last green or inside the next driver window.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_PY = os.path.join(
    REPO, "kafka2clickhouse_py_streamer_spark", "operators", "base.py"
)
# The driver records roughly this many rows per round.
WINDOW = 50


def correctness_files() -> list[tuple[int, str]]:
    """(round, path) for every CORRECTNESS_r*.json, ascending round."""
    out = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            out.append((int(m.group(1)), path))
    return sorted(out)


def _row_green(row: object) -> bool:
    return (
        isinstance(row, dict)
        and not row.get("err")
        and not row.get("error")
        and row.get("rows_match") is not False
        and row.get("hash_match") is not False
    )


def evidence() -> tuple[dict[str, int], dict[str, int], int]:
    """Per-query latest green round and latest errored round.

    Returns (last_green, last_err, latest_round). A query absent from
    both dicts has never been driver-checked.
    """
    last_green: dict[str, int] = {}
    last_err: dict[str, int] = {}
    latest = 0
    for rnd, path in correctness_files():
        latest = max(latest, rnd)
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if _row_green(row):
                last_green[name] = max(last_green.get(name, 0), rnd)
            else:
                last_err[name] = max(last_err.get(name, 0), rnd)
    return last_green, last_err, latest


def defining_file(qname: str, registry: dict) -> str:
    """Repo-relative path of the module that defines the query's fn."""
    fn = registry[qname].fn
    path = getattr(getattr(fn, "__code__", None), "co_filename", "")
    return os.path.relpath(path, REPO) if path else ""


def round_commit(rnd: int) -> str | None:
    """Commit that first added CORRECTNESS_r{rnd}.json (the round seal)."""
    try:
        out = subprocess.run(
            ["git", "log", "--diff-filter=A", "--format=%H",
             "--", f"CORRECTNESS_r{rnd:02d}.json"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.split()
        return out[-1] if out else None
    except Exception:
        return None


def churned_since(commit: str | None) -> set[str]:
    """Repo-relative files changed between *commit* and the worktree."""
    if not commit:
        return set()
    try:
        out = subprocess.run(
            ["git", "diff", "--name-only", commit],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.split()
        return set(out)
    except Exception:
        return set()


def rotation() -> tuple[list[str], dict[str, str]]:
    """Full registry ordering + a {query: reason} map for the header."""
    from kafka2clickhouse_py_streamer_spark.operators.base import all_queries

    registry = all_queries()
    names = list(registry)
    last_green, last_err, latest = evidence()
    churn_by_round = {
        rnd: churned_since(round_commit(rnd))
        for rnd in {r for r in last_green.values()}
    }

    reasons: dict[str, str] = {}

    def key(name: str) -> tuple:
        pos = names.index(name)
        g = last_green.get(name)
        # NEEDY = would trip the no-aging-out tripwire if left outside
        # the driver window (never green, errored after its last green,
        # or green more than one round ago). Needy status is the
        # PRIMARY sort key so that, when the window is over-subscribed,
        # it is packed exclusively with needy queries — otherwise the
        # tool's category order could seat a freshly-green-but-churned
        # query above a stale one and make the tripwire unsatisfiable
        # by construction (round-5 review find).
        needy = 0 if (
            g is None
            or last_err.get(name, 0) > g
            or g < latest - 1
        ) else 1
        if g is None or last_err.get(name, 0) > g:
            reasons[name] = "never-green" if g is None else f"errored-r{last_err[name]:02d}"
            return (needy, 0, 0, 0, pos)
        # Age-primary: last-green round before churn status, so the
        # stalest driver evidence can never be starved by a flood of
        # fresher-but-churned greens (round-9 verdict).  Churned still
        # outranks unchurned WITHIN the same round.
        if defining_file(name, registry) in churn_by_round.get(g, set()):
            reasons[name] = f"green-r{g:02d} but file churned since"
            return (needy, 1, g, 0, pos)
        reasons[name] = f"green-r{g:02d}"
        return (needy, 1, g, 1, pos)

    return sorted(names, key=key), reasons


def render(order: list[str], reasons: dict[str, str]) -> str:
    lines = ["_VERIFY_FIRST = ["]
    prev = None
    for n in order:
        r = reasons[n]
        group = r.split(" ")[0]
        if group != prev:
            lines.append(f"    # {r}")
            prev = group
        lines.append(f'    "{n}",')
    lines.append("]")
    return "\n".join(lines)


def main() -> None:
    order, reasons = rotation()
    block = render(order, reasons)
    counts: dict[str, int] = {}
    for r in reasons.values():
        counts[r.split(" ")[0]] = counts.get(r.split(" ")[0], 0) + 1
    header = "# " + "  ".join(f"{k}: {v}" for k, v in sorted(counts.items()))
    if "--write" in sys.argv:
        with open(BASE_PY) as f:
            src = f.read()
        new = re.sub(
            r"_VERIFY_FIRST = \[.*?\n\]", block, src, count=1, flags=re.S
        )
        if new == src and block not in src:
            raise SystemExit("could not splice _VERIFY_FIRST into base.py")
        with open(BASE_PY, "w") as f:
            f.write(new)
        print(header)
        print(f"wrote {len(order)} entries to {os.path.relpath(BASE_PY, REPO)}")
    else:
        print(header)
        print(block)


if __name__ == "__main__":
    main()
