"""Physical-plan inspection utilities — the engine's plan-quality contract.

The reference hard-codes its optimizations (SURVEY.md §4: segment pruning,
inverted-index set algebra, early-exit scans); this engine delegates them
to Catalyst, so the guarantee moves from "we wrote the loop" to "the
planner produced the right physical shape".  These helpers make that shape
assertable (used by tests/test_plans.py and for interactive tuning — every
SCALE.md claim is checkable through them).
"""

from __future__ import annotations

import contextlib
import re

from pyspark.sql import DataFrame

# Active sink for note_iteration facts (None = disabled, the production
# default — recording costs one plan render per checkpoint, so it is
# opt-in via record_iterations()).
_ITER_LOG: list | None = None


@contextlib.contextmanager
def record_iterations():
    """Collect per-iteration plan facts from checkpoint-truncated loops.

    ``localCheckpoint`` severs lineage, so the FINAL plan of an iterative
    operator (pagerank, k_core, connected_components, ...) is a stub that
    under-reports the work actually executed — the plan-audit blind spot
    flagged in round 6's verdict.  Operators call :func:`note_iteration`
    immediately before each checkpoint; inside this context every such
    call appends ``(tag, shuffle_count)`` for the pre-checkpoint plan, so
    the audit can report ``final + sum(iteration)`` shapes.  Yields the
    live list of facts.
    """
    global _ITER_LOG
    prev, _ITER_LOG = _ITER_LOG, []
    try:
        yield _ITER_LOG
    finally:
        _ITER_LOG = prev


def note_iteration(df: DataFrame, tag: str) -> DataFrame:
    """Record ``df``'s pre-checkpoint plan shape under ``tag`` (no-op and
    zero-cost unless a :func:`record_iterations` context is active).
    Returns ``df`` so call sites read ``note_iteration(df, "op").localCheckpoint()``."""
    if _ITER_LOG is not None:
        _ITER_LOG.append((tag, shuffle_count(df)))
    return df


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
