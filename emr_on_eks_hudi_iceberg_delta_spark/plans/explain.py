"""Physical-plan introspection — the 100 TB design contract, checkable.

The reference delegates all optimization to Catalyst/AQE (SURVEY.md §4:
"zero optimizer rules of its own"). At scale what matters is whether the
*declared* plan actually compiles to the physical shape you designed for:
filters reaching the parquet scan, small dimensions broadcast, no stray
shuffles, pruned read schemas. These helpers extract those facts from
``explain("formatted")`` output so tests (tests/test_plans.py) can pin the
plan shape, not just the results.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if any parquet scan pushes a filter containing ``fragment``."""
    for line in formatted_plan(df).splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def scan_read_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (pruning check)."""
    out = []
    for line in formatted_plan(df).splitlines():
        m = re.search(r"ReadSchema: struct<(.*)>", line.strip())
        if m:
            cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
            out.append(cols)
    return out


def broadcast_join_count(df: DataFrame) -> int:
    """Broadcast joins in the plan (hash or nested-loop, counted once each
    via their numbered detail entries)."""
    return len(
        re.findall(r"\(\d+\) Broadcast(?:Hash|NestedLoop)Join", formatted_plan(df))
    )


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excluding broadcast exchanges)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange", plan))


def file_scan_count(df: DataFrame) -> int:
    """File-source scans the plan will EXECUTE: parquet scans in the plan
    tree EXCLUDING subtrees rooted at ``InMemoryRelation`` (a cached
    relation's defining plan is printed inline but does not run once the
    cache is materialized — a fully cache-served plan reports 0)."""
    tree = formatted_plan(df).split("\n\n", 1)[0]
    count = 0
    skip_indent: int | None = None
    for line in tree.splitlines():
        indent = re.match(r"^[\s:+\-]*", line).end()
        rest = line[indent:]
        if skip_indent is not None:
            if indent > skip_indent:
                continue
            skip_indent = None
        if "InMemoryRelation" in rest:
            skip_indent = indent
            continue
        if rest.lstrip("* ").startswith("Scan parquet"):
            count += 1
    return count


def in_memory_scan_count(df: DataFrame) -> int:
    """Numbered InMemoryTableScan operators — reads served by a persisted
    relation instead of recomputation."""
    return len(re.findall(r"\(\d+\) InMemoryTableScan", formatted_plan(df)))
