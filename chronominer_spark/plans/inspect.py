"""Physical-plan inspection — the `.explain` discipline as assertions.

The reference hand-implements its optimizations (skip-before-work,
projection pruning, constant folding — SURVEY.md §4); here Catalyst does
them, and these helpers let tests and tools *prove* it stays that way:
filters pushed to the parquet scan, scans column-pruned, small sides
broadcast, no gratuitous exchanges. Regressing any of these silently is
how a plan that worked at sf0.01 falls over at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def _formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def explain_formatted(df: DataFrame) -> str:
    try:
        return _formatted(df)
    except Exception:
        return physical_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    text = explain_formatted(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        entry = m.group(1).strip()
        if entry:
            out.extend(s.strip() for s in entry.split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per scan — the column-pruning witness."""
    text = explain_formatted(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        out.append(cols)
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan.
    Broadcast exchanges are excluded — they ship dimension tables, not
    the fact stream."""
    plan = physical_plan(df)
    return len(re.findall(r"(?<!Broadcast)Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or \
        "BroadcastNestedLoopJoin" in physical_plan(df)
