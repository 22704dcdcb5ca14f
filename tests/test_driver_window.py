"""Driver-window contract: the correctness driver checks only the FIRST
50 ``queries()`` entries per round, so the registry's explicit ordering
is load-bearing evidence policy, not cosmetics. These tests freeze the
r11 rotation (policy pinned in _registry.py since r8): entries with no
driver evidence lead, then entries whose code changed this round, then
the stalest recorded evidence; every _DRIVER_ORDER_HEAD name must
actually exist (a typo would silently demote an entry to the unchecked
tail)."""

from __future__ import annotations

from iceberg_rest_server_spark.queries import REGISTRY, queries
from iceberg_rest_server_spark.queries._registry import _DRIVER_ORDER_HEAD

# (1) code changed in r11: cosine_neardup_pairs_blocked gained a
# score-matrix cap (operators/similarity.py target_score_bytes) — the
# input-payload cap alone admitted 34 GB per-task score matrices at
# scale. blocks stays 2 at registry corpus sizes (results and plans
# unchanged), but the 2 entries sharing the operator re-run per the
# pinned changed-code-first policy.
R11_CHANGED = [
    "q35_cosine_neardup_pairs",
    "q59_semantic_dedup",
]

# (2) the 34 entries whose last driver-recorded green was r05 (computed
# from CORRECTNESS_r01..r10 at the start of r11; matches VERDICT r10
# "Next round #1"). The other r11 code changes (ADVICE r10) are all
# management-layer — no query operator — but the catalog-surface
# entries whose execution path crosses the changed store code lead
# their cohort per the same policy.
STALE_R05 = [
    "q34_catalog_end_to_end",
    "q82_merge_upsert",
    "q83_row_level_delete",
    "q07_inner_join",
    "q08_broadcast_join",
    "q09_multiway_join",
    "q111_hll_union_rollup",
    "q127_kmeans_clustering",
    "q129_scd2_reconstruction",
    "q130_interval_concurrency",
    "q131_markov_transitions",
    "q132_rfm_segmentation",
    "q133_hard_negative_mining",
    "q135_time_weighted_average",
    "q136_cooccurrence_similarity",
    "q137_observed_metrics",
    "q138_quantile_bucket_scores",
    "q139_xml_roundtrip",
    "q142_zscore_outliers",
    "q143_basket_affinity",
    "q144_theta_set_operations",
    "q145_kll_quantile_rollup",
    "q14_asof_join",
    "q15_rollup",
    "q16_window_ranking",
    "q18_topk",
    "q31_exact_dedup",
    "q32_minhash_lsh_pairs",
    "q36_ann_lsh_topk",
    "q38_ann_ivf_topk",
    "q63_tpch_q1",
    "q69_tpch_q8",
    "q74_tpch_q17",
    "q88_cms_heavy_hitters",
]

# (3) fills: the r07 cohort is 46 entries of equal staleness, so the
# pinned tie-break is alphabetical; the first 14 fill the window
# exactly (q141 leads: Python Data Source, catalog-store path;
# q158/q159 displaced to r12 by the changed-operator entries).
# The remaining 32 lead r12.
R07_FILLS = [
    "q141_python_datasource",
    "q126_pmi_collocations",
    "q128_edit_distance_join",
    "q146_bigram_lm_perplexity",
    "q147_bm25_topk",
    "q148_vocab_growth",
    "q149_skipgram_associations",
    "q150_winsorized_stats",
    "q151_embedding_dim_audit",
    "q153_join_key_skew_profile",
    "q154_eval_quota_sample",
    "q155_intradoc_repeat_collapse",
    "q156_analyze_column_stats",
    "q157_triangle_count",
]


def test_every_head_name_exists():
    missing = [n for n in _DRIVER_ORDER_HEAD if n not in REGISTRY]
    # the single allowed absentee is the protobuf-gated TWS entry
    assert missing in ([], ["q140_stream_transform_with_state"]), missing


def test_window_covers_changed_then_stale_then_fills():
    window = list(queries())[:50]
    assert window[: len(R11_CHANGED)] == R11_CHANGED
    n1 = len(R11_CHANGED)
    assert window[n1 : n1 + len(STALE_R05)] == STALE_R05
    assert window[n1 + len(STALE_R05) :] == R07_FILLS
    # catalog-surface entries crossing the r11 store change lead their cohort
    assert window[n1 : n1 + 3] == [
        "q34_catalog_end_to_end", "q82_merge_upsert", "q83_row_level_delete"
    ]
    assert window[n1 + len(STALE_R05)] == "q141_python_datasource"
    # exactly full: nothing wasted, nothing spilled
    assert len(set(window)) == 50
    assert len(R11_CHANGED) + len(STALE_R05) + len(R07_FILLS) == 50


def test_ordering_is_reordering_not_selection():
    names = list(queries())
    assert set(names) == set(REGISTRY)
    assert len(names) == len(REGISTRY)
