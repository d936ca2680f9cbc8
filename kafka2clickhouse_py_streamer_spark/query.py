"""Query-runner CLI: run any registry operator from the shell.

    python -m kafka2clickhouse_py_streamer_spark.query              # list
    python -m kafka2clickhouse_py_streamer_spark.query q01_pricing_summary
    python -m kafka2clickhouse_py_streamer_spark.query d03_minhash_lsh \
        --sf-dir /root/testdata/sf0.1 --limit 5 --explain

The switch-over surface for a reference user: every operator the engine
implements is runnable by name against any fixture scale, with the
physical plan one flag away.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m kafka2clickhouse_py_streamer_spark.query",
        description="Run a registry query by name.",
    )
    p.add_argument("name", nargs="?", help="query name (omit to list)")
    p.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="fixture directory (default sf0.01)",
    )
    p.add_argument(
        "--limit", type=int, default=20, help="rows to show (default 20)"
    )
    p.add_argument(
        "--explain",
        action="store_true",
        help="print the formatted physical plan instead of rows",
    )
    p.add_argument(
        "--oracle",
        action="store_true",
        help="print the DuckDB oracle SQL and exit",
    )
    p.add_argument(
        "--count",
        action="store_true",
        help="also print the total row count (runs the plan a second "
        "time — costly on the heavy queries)",
    )
    args = p.parse_args(argv)

    from kafka2clickhouse_py_streamer_spark.operators.base import all_queries

    registry = all_queries()
    if not args.name:
        for name, q in sorted(registry.items()):
            print(f"{name:28s} {q.doc}")
        return 0
    if args.name not in registry:
        matches = [n for n in registry if args.name in n]
        if len(matches) == 1:
            args.name = matches[0]
        else:
            print(
                f"unknown query {args.name!r}"
                + (f"; did you mean one of {matches}?" if matches else ""),
                file=sys.stderr,
            )
            return 2
    q = registry[args.name]
    if args.oracle:
        print(q.oracle or "-- no oracle (rows-only query)")
        return 0

    from kafka2clickhouse_py_streamer_spark.session import get_spark

    spark = get_spark(app_name=f"query-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = q.fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
        if args.count:
            print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
