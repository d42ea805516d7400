"""The declared workload: every implemented operator exposed as a
(spark, sf_dir) → DataFrame query plus, where SQL-expressible, an exact
DuckDB oracle (SURVEY.md §2.9).  Consumed by __spark_entry__ (the driver
contract), tools/oracle_check.py, and bench.py."""

from __future__ import annotations

from . import (
    docs,
    embeddings_q,
    events_q,
    multimodal_q,
    promql_q,
    streaming_q,
    tpch,
    tsdb_queries,
)

_ALL_QUERIES = {
    **tsdb_queries.QUERIES,
    **promql_q.QUERIES,
    **tpch.QUERIES,
    **docs.QUERIES,
    **embeddings_q.QUERIES,
    **events_q.QUERIES,
    **multimodal_q.QUERIES,
    **streaming_q.QUERIES,
}

_ALL_ORACLES = {
    **tsdb_queries.ORACLES,
    **promql_q.ORACLES,
    **tpch.ORACLES,
    **docs.ORACLES,
    **embeddings_q.ORACLES,
    **events_q.ORACLES,
    **multimodal_q.ORACLES,
    **streaming_q.ORACLES,
}

# Registry order matters: the correctness driver verifies the first N
# entries (N=50).  From round 6 the window follows the pinned 3-round
# rotation schedule in ``rotation.py`` (CYCLE partitions the 150-query
# registry; tests/test_rotation.py fails when a new round starts and this
# list hasn't been rotated, or when a query is added without rebalancing
# the plan).  This round (6): the 42 never-driver-verified queries (41
# added mid-round-5 + tsdb_ingest_dedup added this round) + the 8
# round-2-stale queries over the similarity/multimodal code families that
# churn this round.  Round 7 next: remaining round-2-stale + all TPC-H
# (newest rows r4).  Round 8: the round-5 window verbatim.
# The window AUTO-ADVANCES: the current round is inferred from the
# CORRECTNESS_r*.json files the driver leaves at the repo root, so when a
# new round starts the registry reorders itself to that round's planned
# window — the manual-rotation failure mode (rounds 3-5 each left 11-41
# queries stranded past slot 50) is gone.  Fallback to the anchor window
# if the round can't be inferred (files missing): the import must never
# fail the driver contract.
from . import rotation as _rotation

try:
    _PRIORITY = list(
        _rotation.planned_window(
            max(_rotation.current_round(), _rotation.ANCHOR_ROUND)
        )
    )
except Exception:
    _PRIORITY = list(_rotation.CYCLE[_rotation.ANCHOR_ROUND])

assert set(_PRIORITY) <= set(_ALL_QUERIES), sorted(set(_PRIORITY) - set(_ALL_QUERIES))

QUERIES = {name: _ALL_QUERIES[name] for name in _PRIORITY}
QUERIES.update({n: q for n, q in _ALL_QUERIES.items() if n not in QUERIES})

ORACLES = {name: _ALL_ORACLES[name] for name in _PRIORITY if name in _ALL_ORACLES}
ORACLES.update({n: q for n, q in _ALL_ORACLES.items() if n not in ORACLES})

__all__ = ["QUERIES", "ORACLES"]
