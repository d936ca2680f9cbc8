"""Verify per-query metric quotes in prose docs against bench artifacts.

Round-4 verdict (VERDICT.md "What's wrong" #2) flagged the second
occurrence of doc-vs-artifact drift: SCALE.md / ROUND4.md quoted sf1
scaling ratios from intermediate re-recordings that contradicted the
final BENCH_sf1.json. This tool makes the fix structural: it greps
SCALE.md and ROUND*.md for `<query-key> <N.N>x` ratio quotes and
`<query-key> ... <N.NNN> s` timing quotes, and checks each against the
union of recorded artifact numbers for that query:

  - BENCH_sf1.json  sf0.1 / sf1 seconds and scaling_ratio
  - BENCH_r{NN}.json per-query seconds
  - cross-round ratios r{N}/r{M} for every recorded round pair

A quote matches if some candidate rounds to the quoted value at the
quoted precision. Lines carrying the marker "(unrecorded)" are exempt
(fixture-scale observations that were never artifact-recorded must say
so explicitly). Exit 1 with a per-quote report on any mismatch.

Run: python tools/check_doc_metrics.py   (wired into tests/test_doc_metrics.py)
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _committed_versions(relpath: str) -> list[dict]:
    """Every committed version of ``relpath`` as parsed JSON.

    BENCH_SPREAD.json is a mutable sidecar: the driver's post-seal bench
    rerun overwrites it in place (round 8's doc-metrics failure — the
    working tree contradicted ROUND8.md's committed quotes). Quotes are
    legitimate if they match ANY committed recording, so resolve against
    git history, not just the current file. Degrades to [] outside git.
    """
    try:
        revs = subprocess.run(
            ["git", "-C", REPO, "rev-list", "HEAD", "--", relpath],
            capture_output=True, text=True, timeout=30,
        ).stdout.split()
        out, seen = [], set()
        for rev in revs:
            blob = subprocess.run(
                ["git", "-C", REPO, "show", f"{rev}:{relpath}"],
                capture_output=True, text=True, timeout=30,
            )
            if blob.returncode != 0:
                continue
            h = hash(blob.stdout)
            if h in seen:
                continue
            seen.add(h)
            try:
                out.append(json.loads(blob.stdout))
            except ValueError:
                pass
        return out
    except Exception:
        return []

DOCS = sorted(
    glob.glob(os.path.join(REPO, "ROUND*.md")) + [os.path.join(REPO, "SCALE.md")]
)

# d03, q03, s13, w07, m06, t12, p04 ... optionally followed by _suffix
KEY_RE = re.compile(r"\b([qdstpwm]\d{2})(?:_[a-z0-9_]+)?\b")
# 5.4x / 1.27× — a decimal immediately suffixed by x or ×
RATIO_RE = re.compile(r"\b(\d+\.\d+)[x×]\b")
# 1.843 s / 1.843s / "0.734 s)" — >=2 decimals so "5 s" prose never matches
SECS_RE = re.compile(r"\b(\d+\.\d{2,})\s?s\b")
EXEMPT_MARK = "(unrecorded)"


def _load_candidates():
    """key -> set of recorded numbers that may legitimately be quoted."""
    cands: dict[str, set[float]] = {}

    def add(key, val):
        if isinstance(val, (int, float)):
            cands.setdefault(key, set()).add(float(val))

    # BENCH_sf1.json is overwritten per re-recording; BENCH_sf1_r{NN}
    # archives keep earlier rounds' quotes (in ROUND*.md) checkable
    sf1_sources = [
        json.load(open(p))
        for p in sorted(glob.glob(os.path.join(REPO, "BENCH_sf1*.json")))
    ] + _committed_versions("BENCH_sf1.json")
    for sf1 in sf1_sources:
        for section in ("sf0.1", "sf1", "scaling_ratio"):
            for k, v in sf1.get(section, {}).items():
                add(k[:3], v)
        # stage_breakdown: {"p07_decontam_probe": {"sf0.1": s, "sf1":
        # s, "ratio": r}, ...} — stage keys carry the query prefix
        for k, stages in sf1.get("stage_breakdown", {}).items():
            for v in stages.values():
                add(k[:3], v)
        # rep_detail / *_structural (warm-probe receipts, round 13):
        # every numeric under a query-keyed subtree is a recording
        def _walk(key, obj):
            if isinstance(obj, dict):
                for v in obj.values():
                    _walk(key, v)
            elif isinstance(obj, list):
                for v in obj:
                    _walk(key, v)
            else:
                add(key, obj)

        for section in ("rep_detail",):
            for k, sub in sf1.get(section, {}).items():
                _walk(k[:3], sub)
        for sk, sub in sf1.items():
            if sk.endswith("_structural"):
                _walk(sk[:3], sub)

    rounds = {}
    spread_glob = glob.glob(os.path.join(REPO, "BENCH_SPREAD*.json"))
    # BASELINE_SUBSET.json (the anchored r01-subset re-base, round 13)
    # shares the sidecar shape — its walls/spreads are recordings and
    # must be quotable (and enter the cross-round ratio grid, so
    # "q06 1.68x of r01" style quotes resolve)
    base_glob = glob.glob(os.path.join(REPO, "BASELINE_SUBSET.json"))
    sources: list[tuple[str, dict]] = [
        (p, json.load(open(p)))
        for p in sorted(
            glob.glob(os.path.join(REPO, "BENCH_r*.json"))
            + spread_glob + base_glob
        )
    ]
    # plus every committed historical version of the mutable sidecars —
    # a driver rerun that overwrites the working-tree file must not
    # invalidate quotes that matched a committed recording
    for i, data in enumerate(_committed_versions("BENCH_SPREAD.json")):
        sources.append((f"git:BENCH_SPREAD.json@{i}", data))
    for p, data in sources:
        # driver rounds wrap the bench JSON line under "parsed"; the
        # wrap is null when the driver's tail window missed the line
        # (BENCH_r07) — fall back to any top-level queries dict
        qs = (data.get("parsed") or data).get("queries", {})
        if not qs and data.get("tail"):
            # the numbers still exist inside the truncated tail text —
            # recover '"<key>": <float>' pairs so genuinely-recorded
            # r07 values stay quotable
            qs = {
                m.group(1): float(m.group(2))
                for m in re.finditer(
                    r'"([qdstpwm]\d{2}_\w+)":\s*([0-9.]+)', data["tail"]
                )
            }
        rounds[p] = qs
        for k, v in qs.items():
            add(k[:3], v)
        # the local sidecar additionally records per-rep spreads —
        # quoted band endpoints must be checkable too
        for k, band in (data.get("parsed") or data).get("rep_spread", {}).items():
            for v in band:
                add(k[:3], v)
        # round-13: the sidecar's rotating longitudinal extras
        # (bench.select_extras) are recordings like any other
        body = data.get("parsed") or data
        for k, v in body.get("extra_queries", {}).items():
            add(k[:3], v)
        for k, band in body.get("extra_rep_spread", {}).items():
            for v in band:
                add(k[:3], v)

    # cross-round ratios (e.g. "p04 0.61x" = r04/r03)
    round_list = list(rounds.values())
    for i, qa in enumerate(round_list):
        for qb in round_list[i + 1 :]:
            for k in set(qa) & set(qb):
                if qa[k] and qb[k]:
                    add(k[:3], qb[k] / qa[k])
                    add(k[:3], qa[k] / qb[k])
    return cands


def _matches(quoted: str, candidates: set[float]) -> bool:
    v = float(quoted)
    decimals = len(quoted.split(".")[1]) if "." in quoted else 0
    tol = 0.5 * 10 ** (-decimals) + 1e-9
    return any(abs(c - v) <= tol for c in candidates)


def check() -> list[str]:
    cands = _load_candidates()
    problems = []
    for doc in DOCS:
        if not os.path.exists(doc):
            continue
        for lineno, line in enumerate(open(doc, encoding="utf-8"), 1):
            if EXEMPT_MARK in line:
                continue
            keys = [m for m in KEY_RE.finditer(line)]
            if not keys:
                continue
            nums = [m for m in RATIO_RE.finditer(line)] + [
                m for m in SECS_RE.finditer(line)
            ]
            for nm in nums:
                # attribute the number to the nearest preceding key on the line
                prior = [k for k in keys if k.start() < nm.start()]
                if not prior:
                    continue
                key = prior[-1].group(1)
                # skip numbers inside an A->B arrow (before/after pairs
                # whose "before" is an unrecorded working measurement)
                pre = line[max(0, nm.start() - 2) : nm.start()]
                post = line[nm.end() : nm.end() + 2]
                if "→" in pre or "→" in post or "->" in pre or "->" in post:
                    continue
                if key not in cands:
                    continue  # query never benched; prose-only mention
                if not _matches(nm.group(1), cands[key]):
                    problems.append(
                        f"{os.path.basename(doc)}:{lineno}: {key} quoted as "
                        f"{nm.group(0)!r} matches no recorded artifact number; "
                        f"line: {line.strip()[:120]}"
                    )
    return problems


def check_counts() -> list[str]:
    """Pinned-count checks (same drift class as the metric quotes —
    the round-5 reviews caught 'N parity cases' and 'N registry
    queries' wrong three times): every doc claim of registry size or
    adversarial parity-case count must match the code."""
    problems: list[str] = []
    sweep_src = os.path.join(REPO, "tests", "test_adversarial.py")
    s = open(sweep_src, encoding="utf-8").read()

    def grab(name):
        m = re.search(r"^" + name + r" = \[(.*?)\]", s, re.S | re.M)
        return len(re.findall(r'"[a-z0-9_]+"', m.group(1)))

    parity = grab("SWEEP") + grab("EVENTS_SWEEP") + grab("EMB_SWEEP")
    sys.path.insert(0, REPO)
    from kafka2clickhouse_py_streamer_spark.operators.base import (
        all_queries,
    )

    n_queries = len(all_queries())
    # counts are CURRENT-state claims: check only the inventory doc and
    # the latest round changelog (historical ROUND*.md describe their
    # own rounds' states and must keep their numbers)
    rounds = sorted(
        glob.glob(os.path.join(REPO, "ROUND*.md")),
        key=lambda p: int(re.search(r"(\d+)", os.path.basename(p)).group(1)),
    )
    current_docs = [
        os.path.join(REPO, "OPERATORS.md"),
        os.path.join(REPO, "README.md"),
    ] + rounds[-1:]
    for doc in current_docs:
        if not os.path.exists(doc):
            continue
        text = open(doc, encoding="utf-8").read()
        for m in re.finditer(r"(\d+) parity\s*\ncases|(\d+) parity cases", text):
            n = int(m.group(1) or m.group(2))
            if n != parity:
                problems.append(
                    f"{os.path.basename(doc)}: claims {n} parity cases, "
                    f"sweep lists total {parity}"
                )
        for m in re.finditer(r"(\d+) registry queries|(\d+) queries / \d+ DuckDB", text):
            n = int(m.group(1) or m.group(2))
            if n != n_queries:
                problems.append(
                    f"{os.path.basename(doc)}: claims {n} registry "
                    f"queries, all_queries() has {n_queries}"
                )
    return problems


def check_window_claims(docs: list[str] | None = None) -> list[str]:
    """Window-composition claims must quote the artifact, not the
    intent (round-9 verdict finding #1: ROUND9.md and commit fba9f7a
    claimed q01/q06/q12/q13 'head the r09 window' while the committed
    rotation had them at positions 64-67, outside the 50-row driver
    window, and CORRECTNESS_r09 contains none of them).

    Any ROUND*.md sentence that says query keys head / headed the
    round-N driver window is verified against the recorded evidence:

      - sealed round (CORRECTNESS_r{N}.json exists): every named key
        must have a row in that artifact — the driver actually
        recorded it inside the window;
      - round in progress (no artifact yet): every named key must sit
        inside the first WINDOW entries of the committed
        ``_VERIFY_FIRST`` — the claim is at least true of the list
        the driver will read.

    Sentences with no query keys ("the 35 r02-stale queries head...")
    or negated claims ("outside the ... window") are not checkable and
    are skipped; the defect class being closed is the falsely-positive
    composition claim.
    """
    sys.path.insert(0, REPO)
    from kafka2clickhouse_py_streamer_spark.operators.base import (
        _VERIFY_FIRST,
    )

    WINDOW = 50
    problems: list[str] = []
    head_re = re.compile(r"\bhead(?:s|ed)?\b[^.;]*\bwindow\b", re.I)
    round_ref = re.compile(r"\br(?:ound[- ])?0?(\d{1,2})(?:\b|'s)")

    def present(prefix: str, names) -> bool:
        return any(n == prefix or n.startswith(prefix + "_") for n in names)

    for doc in (docs if docs is not None
                else sorted(glob.glob(os.path.join(REPO, "ROUND*.md")))):
        doc_round = int(re.search(r"ROUND(\d+)\.md$", doc).group(1))
        text = open(doc, encoding="utf-8").read()
        # join hard-wrapped lines inside paragraphs so a claim that
        # wraps ("... head\nthe r09 window") is seen as one sentence
        flat = re.sub(r"(?<!\n)\n(?!\n)", " ", text)
        for para in flat.split("\n\n"):
            for sent in re.split(r"(?<=[.;])\s+", para):
                if not head_re.search(sent) or "outside" in sent.lower():
                    continue
                keys = {m.group(1) for m in KEY_RE.finditer(sent)}
                if not keys:
                    continue
                # a sentence can mention several rounds ("the four
                # r04-evidence queries ... head the r09 window") — the
                # claim is about the round NEAREST the word "window"
                win_pos = sent.lower().rindex("window")
                refs = list(round_ref.finditer(sent))
                rnd = (
                    min(refs, key=lambda m: abs(m.start() - win_pos)).group(1)
                    if refs else doc_round
                )
                rnd = int(rnd)
                art = os.path.join(REPO, f"CORRECTNESS_r{rnd:02d}.json")
                if os.path.exists(art):
                    names, src = json.load(open(art)), f"CORRECTNESS_r{rnd:02d}.json"
                else:
                    names, src = list(_VERIFY_FIRST)[:WINDOW], "_VERIFY_FIRST head"
                missing = sorted(k for k in keys if not present(k, names))
                if missing:
                    problems.append(
                        f"{os.path.basename(doc)}: claims {missing} head the "
                        f"round-{rnd} window but they are absent from {src}; "
                        f"sentence: {sent.strip()[:140]}"
                    )
    return problems


def check_headline_citation() -> list[str]:
    """The round-10 verdict (item 4): the driver-run headline noise
    band (~±15%) now exceeds a typical round's real delta, so the
    TRACKED number is the committed sf0.1 sidecar median
    (BENCH_SPREAD.json) with the driver's BENCH_r{N} run quoted beside
    it. The LATEST round note must cite BOTH numbers — one alone
    cherry-picks whichever run looks better.

    Only enforced once both artifacts exist; the sidecar value is
    resolved from the newest sf0.1 recording (working tree if it is an
    sf0.1 run, else the most recent committed sf0.1 version)."""
    # sort by the round number in the BASENAME (round-11 advice: the
    # first integer in the full path would mis-sort under a digit-
    # bearing checkout dir, e.g. a worktree named build2/)
    rounds = sorted(
        glob.glob(os.path.join(REPO, "ROUND*.md")),
        key=lambda p: int(re.search(r"(\d+)", os.path.basename(p)).group(1)),
    )
    if not rounds:
        return []
    note = rounds[-1]
    if int(re.search(r"(\d+)", os.path.basename(note)).group(1)) < 11:
        return []  # the two-number convention starts at round 11
    # every recorded sf0.1 sidecar value is quotable — the note's
    # author cites the one they recorded this round; the driver's own
    # post-seal rerun also lands in this set (it too is a recording)
    sidecar_vals = set()
    candidates = []
    try:
        candidates.append(json.load(open(os.path.join(REPO, "BENCH_SPREAD.json"))))
    except Exception:
        pass
    candidates += _committed_versions("BENCH_SPREAD.json")
    for c in candidates:
        if c.get("sf") == 0.1 and isinstance(c.get("value"), (int, float)):
            sidecar_vals.add(c["value"])
    # latest driver bench — MAIN runs only (BENCH_r{NN}.json). Variant
    # recordings like the round-13 low-core scaling leg
    # (BENCH_r13_c8.json) are per-query scaling evidence, not the
    # headline the two-number convention tracks: a suffixed file sorts
    # AFTER the main run lexically and would silently replace the
    # 32-core headline the note is required to quote (found when the
    # r13 driver's post-seal c8 leg broke this check at the r14 open).
    driver_val = None
    benches = sorted(
        p
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if re.fullmatch(r"BENCH_r\d+\.json", os.path.basename(p))
    )
    for p in reversed(benches):
        parsed = (json.load(open(p)).get("parsed")) or {}
        if isinstance(parsed.get("value"), (int, float)):
            driver_val = (os.path.basename(p), parsed["value"])
            break
    if not sidecar_vals or driver_val is None:
        return []
    text = open(note, encoding="utf-8").read()
    problems = []

    def quoted(v) -> bool:
        # word-boundary match (round-11 advice: a raw substring test
        # let a short value like 3.8 false-pass against any 3.85; the
        # round-12 advice extends the lookahead so an INTEGER value
        # like 270 can't false-pass inside a longer decimal '270.8')
        return re.search(
            r"(?<![\d.])" + re.escape(f"{v}") + r"(?!\d|\.\d)", text
        ) is not None

    if not any(quoted(v) for v in sidecar_vals):
        problems.append(
            f"{os.path.basename(note)}: must quote the tracked sf0.1 "
            f"sidecar median (a recorded BENCH_SPREAD.json value; "
            f"recorded: {sorted(sidecar_vals)})"
        )
    if not quoted(driver_val[1]):
        problems.append(
            f"{os.path.basename(note)}: must quote the latest driver "
            f"headline beside the sidecar ({driver_val[1]} s, {driver_val[0]})"
        )
    # round-11 verdict order 4: quoting raw seconds alone leaves "host
    # or code?" a judgment call — the note must ALSO quote the anchor-
    # normalized headline (headline ÷ host_calibration_sec, the data-
    # free CPU-codegen anchor recorded in the same sidecar run), so a
    # slow host shows up as a stable normalized number. Enforced from
    # round 12; any recorded sidecar's normalized value (1-decimal) is
    # quotable.
    if int(re.search(r"(\d+)", os.path.basename(note)).group(1)) >= 12:
        norm_vals = set()
        for c in candidates:
            v, cal = c.get("value"), c.get("host_calibration_sec")
            if (c.get("sf") == 0.1
                    and isinstance(v, (int, float))
                    and isinstance(cal, (int, float)) and cal):
                norm_vals.add(round(v / cal, 1))
        if norm_vals and not any(quoted(v) for v in norm_vals):
            problems.append(
                f"{os.path.basename(note)}: must quote the anchor-"
                f"normalized headline (headline ÷ host_calibration_sec, "
                f"1 decimal; recorded: {sorted(norm_vals)})"
            )
    return problems


def check_baseline_gate() -> list[str]:
    """Round-12 verdict order 2: the 2× baseline gate must be a
    COMPUTED boolean in the round notes, not an interpreted one. Once
    ``BASELINE_SUBSET.json`` exists (the anchor-carrying re-base,
    tools/rebase_baseline.py), the latest ROUND note must contain a
    "baseline gate" line quoting a ratio that tools/baseline_gate.py
    actually computes for some recorded anchored sidecar, together
    with the matching PASS/FAIL verdict for that ratio."""
    base_path = os.path.join(REPO, "BASELINE_SUBSET.json")
    if not os.path.exists(base_path):
        return []
    rounds = sorted(
        glob.glob(os.path.join(REPO, "ROUND*.md")),
        key=lambda p: int(re.search(r"(\d+)", os.path.basename(p)).group(1)),
    )
    if not rounds or int(
        re.search(r"(\d+)", os.path.basename(rounds[-1])).group(1)
    ) < 13:
        return []
    note = rounds[-1]
    sys.path.insert(0, REPO)
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "baseline_gate", os.path.join(REPO, "tools", "baseline_gate.py")
    )
    gate_mod = _ilu.module_from_spec(spec)
    spec.loader.exec_module(gate_mod)
    base = json.load(open(base_path))
    # every recorded anchored sidecar yields a computable ratio — the
    # note quotes the one for the recording it discusses
    recordings: list[dict] = []
    try:
        recordings.append(
            json.load(open(os.path.join(REPO, "BENCH_SPREAD.json")))
        )
    except Exception:
        pass
    recordings += _committed_versions("BENCH_SPREAD.json")
    verdicts = {}
    for rec in recordings:
        v = gate_mod.evaluate(rec, base)
        if v.get("evaluable"):
            verdicts[f"{v['ratio']:.2f}"] = v["within_gate"]
    # the self-ratio of the re-base recording itself is also quotable
    # (it is 1.00 by construction on the day of the re-base)
    self_v = gate_mod.evaluate(base, base)
    if self_v.get("evaluable"):
        verdicts[f"{self_v['ratio']:.2f}"] = self_v["within_gate"]
    if not verdicts:
        return []
    problems = []
    lines = [
        ln for ln in open(note, encoding="utf-8")
        if "baseline gate" in ln.lower()
    ]
    if not lines:
        return [
            f"{os.path.basename(note)}: must carry a 'baseline gate' "
            f"line quoting the computed anchor-normalized ratio "
            f"(candidates: {sorted(verdicts)}) with its PASS/FAIL "
            f"verdict (BASELINE.md, tools/baseline_gate.py)"
        ]
    found = False
    for ln in lines:
        for m in re.finditer(r"(\d+\.\d{2})[x×]?", ln):
            if m.group(1) in verdicts:
                found = True
                want = "PASS" if verdicts[m.group(1)] else "FAIL"
                if want not in ln.upper():
                    problems.append(
                        f"{os.path.basename(note)}: baseline-gate line "
                        f"quotes ratio {m.group(1)} but lacks the "
                        f"computed verdict {want}: {ln.strip()[:120]}"
                    )
    if not found:
        problems.append(
            f"{os.path.basename(note)}: no baseline-gate line quotes a "
            f"ratio tools/baseline_gate.py computes from a recorded "
            f"anchored sidecar (candidates: {sorted(verdicts)})"
        )
    return problems


if __name__ == "__main__":
    probs = (check() + check_counts() + check_window_claims()
             + check_headline_citation() + check_baseline_gate())
    for p in probs:
        print(p)
    if probs:
        print(f"\n{len(probs)} doc metric quote(s) contradict recorded artifacts.")
        sys.exit(1)
    print("doc metric quotes consistent with bench artifacts")
