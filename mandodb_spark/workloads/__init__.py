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
# (N=50 in round 1), so entries that have never received a driver CORRECTNESS
# row come first, followed by a representative core of every query family.
# Round 1 verified 50/50 in the old order; this rotation puts the remaining 22
# (LLM-pipeline surface: events_*, emb_*, mm_*, three docs_*) inside the window
# while keeping one-of-each proven tsdb/promql/tpch/docs shape in it too.
_PRIORITY = [
    # -- never driver-verified (round 1 window cutoff) --
    "docs_minhash_pairs",
    "docs_simhash_neardup",
    "docs_prep_corpus",
    "emb_cosine_topk",
    "emb_label_centroids",
    "emb_neardup_pairs",
    "emb_ann_bucket_sizes",
    "emb_ivf_topk",
    "events_sessionize",
    "events_funnel",
    "events_retention_cohorts",
    "events_sql_surface",
    "events_set_ops",
    "events_error_window_join",
    "events_hourly",
    "events_pivot",
    "events_topk_users",
    "events_asof_click",
    "events_user_cardinality_approx",
    "mm_binary_features",
    "mm_frame_sample",
    "mm_resize_dims",
    # -- new in round 2 (no CORRECTNESS row yet) --
    "docs_stratified_sample",
    "docs_tfidf_top_terms",
    "docs_repetition",
    "docs_contamination",
    "emb_ivf_neardup_pairs",
    "emb_norm_stats",
    "emb_quantize_error",
    "docs_curation_pipeline",
    "promql_deriv",
    "promql_predict_linear",
    "promql_irate",
    "promql_changes",
    "promql_stddev_over_time",
    "promql_last_over_time",
    "promql_count_values",
    "promql_histogram_quantile",
    "mm_chunk_plan",
    "tpch_q9",
    "tpch_q12",
    "tpch_q21",
    "stream_tumbling_dual",
    "stream_sliding_dual",
    "stream_session_dual",
    # -- implementation changed in round 2 (re-verify in-window) --
    "docs_simhash",
    "docs_cms_token_freq",
    "tsdb_gapfill",
    # -- representative proven core (green in CORRECTNESS_r01, unchanged) --
    "tpch_q1",
    "docs_winnow_fingerprints",
]

assert set(_PRIORITY) <= set(_ALL_QUERIES), sorted(set(_PRIORITY) - set(_ALL_QUERIES))

QUERIES = {name: _ALL_QUERIES[name] for name in _PRIORITY}
QUERIES.update({n: q for n, q in _ALL_QUERIES.items() if n not in QUERIES})

ORACLES = {name: _ALL_ORACLES[name] for name in _PRIORITY if name in _ALL_ORACLES}
ORACLES.update({n: q for n, q in _ALL_ORACLES.items() if n not in ORACLES})

__all__ = ["QUERIES", "ORACLES"]
