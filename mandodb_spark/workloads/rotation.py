"""Driver-window rotation schedule — the staleness invariant as code.

The correctness driver verifies the FIRST 50 registry entries per round
(``__init__._PRIORITY``).  With 150 registered queries, covering every
query within any 3 consecutive windows (the staleness rule from VERDICT
r4 item 3 / r5 item 2: no registered query rests on >2-round-old driver
evidence once the cycle is established) requires the three windows to
PARTITION the registry exactly — 3 x 50 = 150 leaves zero slack.  That
partition is pinned here, and ``tests/test_rotation.py`` fails the suite
when:

- the cycle stops partitioning the registry (e.g. a query was added
  without rebalancing the plan — the registry is capped at
  ``CYCLE_ROUNDS * WINDOW_SIZE``);
- the live ``_PRIORITY`` window for the CURRENT round (inferred from the
  ``CORRECTNESS_r*.json`` files the driver leaves at the repo root)
  drifts from the plan — i.e. a new round started and nobody rotated.

Window composition rationale (round 6 = cycle anchor):

- round 6: the 41 queries added mid-round-5 that have never had a driver
  row (VERDICT r5 item 1 — the rotation note in ``__init__``), plus
  ``tsdb_ingest_dedup`` (new this round, same never-verified class), plus
  the 8 round-2-stale queries whose implementation families churn this
  round (emb_* over operators/similarity.py, mm_* over
  operators/multimodal.py) — stalest evidence on the most-touched code.
- round 7: the remaining 25 round-2-stale queries and all 25 queries
  whose newest row is round 4 (the full TPC-H surface — VERDICT r5
  item 2 requires TPC-H in the r7 window at the latest).  This clears
  the pre-cycle staleness debt completely: after round 7, every
  registered query's newest driver row is round 5, 6, or 7.
- round 8: the 50 queries green in round 5 (the r5 window verbatim).

From round 9 the cycle repeats (9≡6, 10≡7, …).  Adding a query requires
rebalancing: either the registry stays ≤150, or the plan (and this
module) must be regenerated — the partition test makes forgetting loud.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

WINDOW_SIZE = 50
CYCLE_ROUNDS = 3
ANCHOR_ROUND = 6

#: Round-6 window: never-driver-verified additions + churned-family picks.
WINDOW_R6 = [
    # -- added mid-round-5, never a driver row (VERDICT r5 item 1) --
    "tsdb_series_agg_salted",
    "tsdb_export_lineprotocol",
    "tsdb_hist_quantile",
    "tsdb_lineprotocol_roundtrip",
    "tsdb_series_cardinality_sketch",
    "promql_holt_winters",
    "promql_absent",
    "promql_label_math",
    "promql_delta_offset",
    "promql_idelta",
    "tpch_profile_lineitem",
    "tpch_q2",
    "tpch_q11",
    "tpch_q20",
    "docs_pack_plan",
    "docs_mixture_plan",
    "docs_training_shards",
    "docs_chunk_plan",
    "docs_mixture_epochs",
    "docs_quality_outliers",
    "docs_incremental_neardup",
    "docs_pii_scrub",
    "docs_lang_confusion",
    "docs_pack_nosplit",
    "docs_lsh_recall",
    "docs_dup_stats",
    "docs_bloom_gate",
    "docs_shuffle_plan",
    "docs_source_cap",
    "docs_gopher_gate",
    "docs_span_dedup",
    "emb_pq_error",
    "emb_pq_adc_topk",
    "emb_semdedup",
    "emb_ivfpq_topk",
    "emb_matryoshka_error",
    "events_top_paths",
    "events_gap_stats",
    "mm_audio_rms",
    "stream_join_dual",
    "stream_enrich_dual",
    # -- new in round 6 (ingest duplicate policy, VERDICT r5 item 3) --
    "tsdb_ingest_dedup",
    # -- round-2-stale queries over the code families churning this round
    #    (similarity.py: IVF drift/rebuild; multimodal.py: codec breadth) --
    "emb_cosine_topk",
    "emb_neardup_pairs",
    "emb_ann_bucket_sizes",
    "emb_ivf_topk",
    "emb_ivf_neardup_pairs",
    "mm_binary_features",
    "mm_frame_sample",
    "mm_resize_dims",
]

#: Round-7 window: remaining round-2-stale + the full round-4 (TPC-H) debt.
WINDOW_R7 = [
    # -- newest driver row round 2 --
    "events_pivot",
    "events_topk_users",
    "promql_deriv",
    "promql_predict_linear",
    "promql_irate",
    "promql_stddev_over_time",
    "promql_last_over_time",
    "promql_count_values",
    "promql_histogram_quantile",
    "tpch_q1",
    "tpch_q9",
    "tpch_q12",
    "tpch_q21",
    "docs_winnow_fingerprints",
    "docs_cms_token_freq",
    "docs_prep_corpus",
    "docs_stratified_sample",
    "docs_tfidf_top_terms",
    "docs_repetition",
    "docs_contamination",
    "docs_curation_pipeline",
    "emb_label_centroids",
    "emb_norm_stats",
    "emb_quantize_error",
    "mm_chunk_plan",
    # -- newest driver row round 4 --
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
    "docs_simhash",
]

#: Round-8 window: the round-5 driver window verbatim (all green r5).
WINDOW_R8 = [
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
    "tsdb_label_cardinality",
    "tsdb_anomaly_zscore",
    "promql_increase",
    "promql_rate",
    "promql_avg_over_time",
    "promql_sum_by_metric",
    "promql_quantile_over_time",
    "promql_resets",
    "promql_topk",
    "promql_changes",
    "promql_binop_on",
    "promql_binop_group_left",
    "promql_vector_unless",
    "promql_subquery_max_rate",
    "emb_knn_join",
    "docs_token_entropy",
    "docs_neardup_clusters",
    "emb_neardup_clusters",
    "docs_curation_full",
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
    "docs_simhash_neardup",
    "docs_minhash_pairs",
    "docs_unigram_ce",
    "docs_vocab",
]

CYCLE: dict[int, list[str]] = {6: WINDOW_R6, 7: WINDOW_R7, 8: WINDOW_R8}


def planned_window(round_no: int) -> list[str]:
    """The window the given round's ``_PRIORITY[:50]`` must equal (as a set)."""
    if round_no < ANCHOR_ROUND:
        raise ValueError(f"rotation plan anchors at round {ANCHOR_ROUND}")
    return CYCLE[ANCHOR_ROUND + (round_no - ANCHOR_ROUND) % CYCLE_ROUNDS]


def current_round(repo_root: str | Path | None = None) -> int:
    """The round in progress: 1 + the newest ``CORRECTNESS_r*.json`` the
    driver left at the repo root (the file for round N appears when round
    N ends, so its successor is live)."""
    root = Path(repo_root) if repo_root else Path(__file__).resolve().parents[2]
    rounds = [
        int(m.group(1))
        for p in root.glob("CORRECTNESS_r*.json")
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", p.name))
    ]
    return (max(rounds) + 1) if rounds else 1


def window_history(repo_root: str | Path | None = None) -> dict[int, list[str]]:
    """Per-round driver windows as actually recorded (any outcome)."""
    root = Path(repo_root) if repo_root else Path(__file__).resolve().parents[2]
    hist: dict[int, list[str]] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", p.name)
        if m:
            hist[int(m.group(1))] = list(json.loads(p.read_text()))
    return hist
