"""The declared workload: every implemented operator exposed as a
(spark, sf_dir) → DataFrame query plus, where SQL-expressible, an exact
DuckDB oracle (SURVEY.md §2.9).  Consumed by __spark_entry__ (the driver
contract), tools/oracle_check.py, and bench.py."""

from __future__ import annotations

from . import docs, embeddings_q, events_q, multimodal_q, promql_q, tpch, tsdb_queries

QUERIES = {
    **tsdb_queries.QUERIES,
    **promql_q.QUERIES,
    **tpch.QUERIES,
    **docs.QUERIES,
    **embeddings_q.QUERIES,
    **events_q.QUERIES,
    **multimodal_q.QUERIES,
}

ORACLES = {
    **tsdb_queries.ORACLES,
    **promql_q.ORACLES,
    **tpch.ORACLES,
    **docs.ORACLES,
    **embeddings_q.ORACLES,
    **events_q.ORACLES,
    **multimodal_q.ORACLES,
}

__all__ = ["QUERIES", "ORACLES"]
