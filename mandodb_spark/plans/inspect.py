"""Physical-plan inspection utilities — the engine's plan-quality contract.

The reference hard-codes its optimizations (SURVEY.md §4: segment pruning,
inverted-index set algebra, early-exit scans); this engine delegates them
to Catalyst, so the guarantee moves from "we wrote the loop" to "the
planner produced the right physical shape".  These helpers make that shape
assertable (used by tests/test_plans.py and for interactive tuning — every
SCALE.md claim is checkable through them).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Executed-plan string (post-AQE node tree)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """``explain("formatted")`` as a string (nodes + per-node details)."""
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """All ``PushedFilters`` entries across the plan's Parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """``ReadSchema`` of each scan — the column-pruning witness."""
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def has_node(df: DataFrame, node: str) -> bool:
    """Does the physical plan contain a node whose name includes ``node``
    (e.g. 'BroadcastHashJoin', 'TakeOrderedAndProject', 'LeftSemi')?"""
    return node in physical_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) nodes — the scale cost headline."""
    return len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)", physical_plan(df)))
