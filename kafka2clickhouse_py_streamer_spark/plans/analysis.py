"""Physical-plan inspection: the 100 TB efficiency contract, testable.

A query that is correct at sf0.01 but scans all columns, skips predicate
pushdown, or shuffles a broadcastable dimension is wrong at scale even
though the oracle passes. These helpers parse ``explain("formatted")``
output so tests can pin the plan shape itself:

- filters reach the parquet scan (``PushedFilters``),
- scans read only the projected columns (``ReadSchema``),
- small dimensions broadcast (``BroadcastHashJoin``),
- the shuffle count matches the operator's minimum,
- hot paths stay inside whole-stage codegen.

(The reference has no optimizer to compare against — SURVEY.md §4; this
is the Catalyst-native replacement for eyeballing ``df.explain()``.)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    plan = formatted_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [
            c.split(":")[0].strip()
            for c in m.group(1).split(",")
            if c.strip()
        ]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def strip_cached_subtrees(plan: str) -> str:
    """Remove every ``InMemoryRelation`` subtree (tree lines AND detail
    blocks) from a formatted plan.

    A persisted frame's cached plan is inlined into formatted explain
    with its own numbered nodes, but those nodes ran ONCE when the
    cache was built — an eagerly-materialized ``persist`` (the
    ``_two_pass_offsets`` disk-backed default since round 7) must not
    inflate per-run shuffle-count pins the way the opaque
    ``localCheckpoint``'s ``Scan ExistingRDD`` leaf never did."""
    lines = plan.splitlines()
    # 1. walk the tree section; collect node ids under InMemoryRelation
    dead: set[str] = set()
    dead_indent: int | None = None
    out_tree: list[str] = []
    detail_start = len(lines)
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) ", line):  # first detail block
            detail_start = i
            break
        indent = len(line) - len(line.lstrip(" :+-*"))
        if dead_indent is not None and (
            indent > dead_indent or not line.strip()
        ):
            dead.update(re.findall(r"\((\d+)\)", line))
            continue
        dead_indent = None
        if "InMemoryRelation" in line:
            dead_indent = indent
            dead.update(re.findall(r"\((\d+)\)", line))
            continue
        out_tree.append(line)
    # 2. drop the dead nodes' detail blocks
    out_details: list[str] = []
    skipping = False
    for line in lines[detail_start:]:
        m = re.match(r"^\((\d+)\) ", line)
        if m:
            skipping = m.group(1) in dead
        if not skipping:
            out_details.append(line)
    return "\n".join(out_tree + out_details)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges) that
    execute when the frame runs — cached ``InMemoryRelation`` subtrees
    are stripped first (their exchanges ran at cache build).

    Formatted explain renders each exchange as a numbered tree node
    (``(20) Exchange``) whose partitioning lives on a separate
    ``Arguments: hashpartitioning(...)`` line — the original
    single-line ``Exchange hashpartitioning`` pattern (simple-mode
    syntax) matched NOTHING in formatted output, so every shuffle-count
    pin silently passed at 0 (round-5 find). Both layouts are counted
    so the helper keeps working if the explain mode ever changes."""
    plan = strip_cached_subtrees(formatted_plan(df))
    inline = re.findall(
        r"\bExchange (?:hashpartitioning|rangepartitioning|"
        r"SinglePartition)",
        plan,
    )
    if inline:
        return len(inline)
    return len(
        re.findall(
            r"\(\d+\) Exchange\s*\nInput[^\n]*\n"
            r"Arguments: (?:hashpartitioning|rangepartitioning|"
            r"SinglePartition)",
            plan,
        )
    )


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Distinct codegen spans. NOTE: with AQE on, codegen ids only
    appear once the plan is final (isFinalPlan=true) — call after an
    action, or expect 0 on a never-executed frame."""
    plan = formatted_plan(df)
    ids = re.findall(r"\[codegen id : (\d+)\]", plan)
    return len(set(ids))


def python_row_ops(df: DataFrame) -> int:
    """Row-at-a-time Python operators in the plan (BatchEvalPython) —
    the hot-path smell. Arrow-batched pandas UDFs (ArrowEvalPython /
    MapInPandas) are the sanctioned Python path and not counted."""
    plan = formatted_plan(df)
    return len(re.findall(r"\bBatchEvalPython\b", plan))
