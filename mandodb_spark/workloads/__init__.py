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

# Registry order matters: the correctness driver verifies the first N entries
# (N=50 in rounds 1-2), so rotation policy per VERDICT r2 §Next-round #1:
# the 45 queries whose only green row is CORRECTNESS_r01 come first (their
# implementations are unchanged but "green last round" is weaker than "green
# now"), then the queries whose implementation/oracle changes in round 3
# (simhash 64-bit rewrite, minhash perf restructure, gapfill winner,
# promql_changes semantics fix).  That fills the 50-slot window exactly.
# New round-3 queries sit immediately after slot 50 so a driver that honors
# more than 50 entries (all 95 are registered) verifies them too; otherwise
# they rotate into the r4 window.
_PRIORITY = [
    # -- only r1 driver rows; rotate back in (VERDICT r2 "What's missing" #1) --
    "tsdb_range_rows",
    "tsdb_downsample",
    "tsdb_eq_match",
    "tsdb_regex_match",
    "tsdb_conjunction",
    "tsdb_series_agg",
    "tsdb_distinct_series",
    "tsdb_label_values",
    "tsdb_bucket_stats",
    "tsdb_retention",
    "tsdb_latest_point",
    "tsdb_rate",
    "tsdb_regex_via_dim",
    "tsdb_label_dim",
    "promql_increase",
    "promql_rate",
    "promql_avg_over_time",
    "promql_sum_by_metric",
    "promql_quantile_over_time",
    "promql_resets",
    "promql_topk",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q22",
    "tpch_window_rank",
    "tpch_rollup",
    "tpch_orders_status",
    "docs_token_stats",
    "docs_top_bigrams",
    "docs_bpe_token_stats",
    "docs_quality",
    "docs_langid",
    "docs_fingerprint_dedup",
    # -- implementation or oracle changed in round 3 (must re-verify) --
    "docs_simhash",
    "docs_simhash_neardup",
    "docs_minhash_pairs",
    "tsdb_gapfill",
    "promql_changes",
    # ---- slot 50 boundary ----
    # -- new in round 3 (verified if the driver honors >50 entries) --
    "promql_binop_on",
    "promql_binop_group_left",
    "promql_vector_unless",
    "emb_knn_join",
    "docs_token_entropy",
    "promql_subquery_max_rate",
    "docs_neardup_clusters",
    "emb_neardup_clusters",
    "docs_curation_full",
    "tsdb_label_cardinality",
    "tsdb_anomaly_zscore",
]

assert set(_PRIORITY) <= set(_ALL_QUERIES), sorted(set(_PRIORITY) - set(_ALL_QUERIES))

QUERIES = {name: _ALL_QUERIES[name] for name in _PRIORITY}
QUERIES.update({n: q for n, q in _ALL_QUERIES.items() if n not in QUERIES})

ORACLES = {name: _ALL_ORACLES[name] for name in _PRIORITY if name in _ALL_ORACLES}
ORACLES.update({n: q for n, q in _ALL_ORACLES.items() if n not in ORACLES})

__all__ = ["QUERIES", "ORACLES"]
