#!/usr/bin/env python
"""Print the next round's ``_VERIFY_FIRST`` list.

The differential-check harness records correctness rows for roughly the
first 50 entries of ``queries()`` per round, so the registry is ordered
unverified-first (``operators/base.py``). After each round, run

    python tools/rotate_verify_first.py CORRECTNESS_r02.json

to get the rotation for the next round: queries that STILL have no
green row anywhere come first, then queries whose latest row errored,
then the rest in registry order. Paste the printed list over
``_VERIFY_FIRST``.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from kafka2clickhouse_py_streamer_spark.operators.base import all_queries

    registry = list(all_queries())
    green: set[str] = set()
    errored: set[str] = set()
    for path in sys.argv[1:]:
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            # row shape (see CORRECTNESS_r01.json): rows_match /
            # schema_match / hash_match booleans + err string
            ok = (
                isinstance(row, dict)
                and not row.get("err")
                and not row.get("error")
                and row.get("rows_match") is not False
                and row.get("hash_match") is not False
            )
            (green if ok else errored).add(name)
    errored -= green
    unchecked = [n for n in registry if n not in green and n not in errored]
    order = (
        [n for n in unchecked]
        + [n for n in registry if n in errored]
    )
    print(f"# unchecked: {len(unchecked)}  errored: {len(errored)}  "
          f"green: {len(green & set(registry))}  registry: {len(registry)}")
    print("_VERIFY_FIRST = [")
    for n in order:
        print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    main()
