#!/usr/bin/env python
"""Record the full-registry local oracle mirror as a committed artifact.

The driver's differential check records ~50 rows per round; with 153+
registry queries the 3-round freshness horizon (50 x 3 = 150) can no
longer cover the registry (round-5 verdict: 53 needy queries, 50
slots). This tool is the recorded backstop: it runs EVERY registry
query on Spark at sf0.01 and compares it against its DuckDB oracle
with the same harness the pytest mirror uses, then writes
``LOCAL_ORACLE_r{N}.json`` (N = latest CORRECTNESS round + 1, i.e. the
round in progress) so driver-window staleness has committed, per-round
evidence instead of an unrecorded "pytest passed locally" claim.

``tests/test_rotation.py::test_stale_spill_is_mirror_green`` asserts
that any query spilling past the driver window's staleness horizon is
green in the latest mirror, making the artifact load-bearing.

Usage:
    python tools/local_oracle_mirror.py          # run + write artifact
    python tools/local_oracle_mirror.py --check  # exit 1 on any red
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

# Queries whose result is legitimately EMPTY at the mirror's scale
# factor: their oracle green is vacuous (0 == 0 proves nothing about
# the operator). r8 verdict, What's-wrong #3. Each entry names the
# crafted-data fixture on which the query is proven NON-empty by
# tests/test_adversarial.py::test_vacuous_mirror_greens_have_nonempty_twins;
# a new vacuous query fails that test until it is mapped here with a
# non-empty twin.
KNOWN_VACUOUS = {
    "d05_embedding_neardup": "crafted_neardup_embeddings",
    "m07_phash_neardup": "crafted_dup_media",
    "q05_anti_join": "crafted_childless_customers",
    "q63_forward_asof": "crafted_pre_order_events",
}


def latest_correctness_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0)


def latest_mirror() -> tuple[int, dict] | tuple[int, None]:
    """(round, parsed artifact) for the newest LOCAL_ORACLE_r*.json."""
    best, data = 0, None
    for p in glob.glob(os.path.join(REPO, "LOCAL_ORACLE_r*.json")):
        m = re.search(r"LOCAL_ORACLE_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best:
            best = int(m.group(1))
            with open(p) as f:
                data = json.load(f)
    return best, data


def run_mirror() -> dict:
    from kafka2clickhouse_py_streamer_spark.operators.base import all_queries
    from kafka2clickhouse_py_streamer_spark.session import get_spark
    from oracle_harness import compare, duckdb_conn

    spark = get_spark(app_name="local_oracle_mirror", shuffle_partitions=8)
    con = duckdb_conn(SF_DIR)
    registry = all_queries()
    results: dict[str, dict] = {}
    t0 = time.time()
    for name in sorted(registry):
        q = registry[name]
        row: dict = {}
        try:
            df = q.fn(spark, SF_DIR)
            if q.oracle:
                res = compare(df, con, q.oracle)
                row = {
                    "ok": bool(res["ok"]),
                    "mode": "oracle",
                    "spark_rows": res["spark_rows"],
                    "duck_rows": res["duck_rows"],
                }
                if res["ok"] and res["spark_rows"] == 0:
                    # 0 == 0 greens are vacuous — annotated so readers
                    # (and the guard test) can't mistake them for a
                    # value-level pass
                    row["vacuous"] = True
                if not res["ok"]:
                    row["detail"] = {
                        k: res[k]
                        for k in ("count_match", "cols_match", "values_match")
                    }
            else:
                n = df.count()
                row = {"ok": n >= 0 and len(df.columns) > 0,
                       "mode": "rows_only", "spark_rows": n}
        except Exception as e:  # record reds, don't abort the sweep
            row = {"ok": False, "mode": "error", "err": f"{type(e).__name__}: {e}"[:500]}
        results[name] = row
        if not row["ok"]:
            print(f"RED  {name}: {row}", file=sys.stderr)
    head = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()
    green = sum(1 for r in results.values() if r["ok"])
    return {
        "round": latest_correctness_round() + 1,
        "sf_dir": SF_DIR,
        "git_head": head,
        "elapsed_sec": round(time.time() - t0, 1),
        "total": len(results),
        "green": green,
        "results": results,
    }


def main() -> int:
    art = run_mirror()
    path = os.path.join(REPO, f"LOCAL_ORACLE_r{art['round']:02d}.json")
    with open(path, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(f"wrote {path}: {art['green']}/{art['total']} green "
          f"in {art['elapsed_sec']}s")
    if "--check" in sys.argv and art["green"] < art["total"]:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
