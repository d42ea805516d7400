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
# (N=50), so rotation policy per VERDICT r4 §Next-round #3.  The round-5
# window, exactly 50 slots:
#   * the 23 queries red in CORRECTNESS_r04 (the events-loader schema break,
#     fixed this round) — every one must show a green current-round row;
#   * the 11 round-3 queries that have NEVER had a driver row (they sat
#     after slot 50 for two consecutive rounds);
#   * the 11 events_* and 3 stream_*_dual queries — green in r2 but built
#     on the rewritten events loader, so "green on the old loader" is stale;
#   * docs_simhash_neardup + docs_minhash_pairs, whose implementations
#     change this round (fingerprint materialization / perf work).
# TPC-H and the core docs queries were green in r4 with code unchanged —
# they rotate out and remain registered after slot 50.
_PRIORITY = [
    # -- red in r4; loader fixed this round --
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
    "tsdb_gapfill",
    "promql_increase",
    "promql_rate",
    "promql_avg_over_time",
    "promql_sum_by_metric",
    "promql_quantile_over_time",
    "promql_resets",
    "promql_topk",
    "promql_changes",
    # -- never driver-verified (added round 3) --
    "promql_binop_on",
    "promql_binop_group_left",
    "promql_vector_unless",
    "promql_subquery_max_rate",
    "emb_knn_join",
    "docs_token_entropy",
    "docs_neardup_clusters",
    "emb_neardup_clusters",
    "docs_curation_full",
    "tsdb_label_cardinality",
    "tsdb_anomaly_zscore",
    # -- downstream of the rewritten events loader --
    "events_sessionize",
    "events_funnel",
    "events_retention_cohorts",
    "events_sql_surface",
    "events_set_ops",
    "events_error_window_join",
    "events_hourly",
    "events_asof_click",
    "events_user_cardinality_approx",
    "stream_tumbling_dual",
    "stream_sliding_dual",
    "stream_session_dual",
    # -- implementation changes this round --
    "docs_simhash_neardup",
    "docs_minhash_pairs",
    # -- new in round 5 (must get a first driver row immediately — the
    #    round-3 queries sat outside the window for two rounds) --
    "docs_unigram_ce",
    "docs_vocab",
    # ---- slot 50 boundary ----
    # events_pivot / events_topk_users rotate just outside: green in r2,
    # same rewritten-loader claim as the events_* above but the two
    # lowest-risk members of that family (pure pivot/topk over the
    # contract-tested loader output).
    "events_pivot",
    "events_topk_users",
]

# Round-6 rotation note (staleness rule: no registered query goes two
# rounds without a driver row).  The following were added mid-round-5,
# AFTER the 50-slot window above was frozen, and MUST occupy first-50
# slots next round; every one is oracle-green locally at sf0.01 AND
# sf0.1 (tools/oracle_check.py):
#   emb_pq_error, emb_pq_adc_topk, docs_pack_plan, docs_mixture_plan,
#   emb_semdedup, docs_training_shards, stream_join_dual,
#   promql_holt_winters, promql_absent, docs_chunk_plan,
#   promql_label_math, promql_delta_offset, promql_idelta,
#   emb_ivfpq_topk, tsdb_series_agg_salted, docs_mixture_epochs,
#   events_top_paths, tpch_profile_lineitem, docs_quality_outliers,
#   tsdb_export_lineprotocol, docs_incremental_neardup, docs_pii_scrub,
#   docs_lang_confusion, emb_matryoshka_error, docs_pack_nosplit,
#   docs_lsh_recall, docs_dup_stats, events_gap_stats, docs_bloom_gate,
#   docs_shuffle_plan, stream_enrich_dual, docs_source_cap,
#   docs_gopher_gate, tsdb_hist_quantile, mm_audio_rms, tpch_q2,
#   tpch_q11, tpch_q20, tsdb_lineprotocol_roundtrip, docs_span_dedup,
#   tsdb_series_cardinality_sketch.
# That is 34 of 50 slots; fill the rest with the oldest-green queries.

assert set(_PRIORITY) <= set(_ALL_QUERIES), sorted(set(_PRIORITY) - set(_ALL_QUERIES))

QUERIES = {name: _ALL_QUERIES[name] for name in _PRIORITY}
QUERIES.update({n: q for n, q in _ALL_QUERIES.items() if n not in QUERIES})

ORACLES = {name: _ALL_ORACLES[name] for name in _PRIORITY if name in _ALL_ORACLES}
ORACLES.update({n: q for n, q in _ALL_ORACLES.items() if n not in ORACLES})

__all__ = ["QUERIES", "ORACLES"]
