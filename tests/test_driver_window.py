"""Driver-window contract: the correctness driver checks only the FIRST
50 ``queries()`` entries per round, so the registry's explicit ordering
is load-bearing evidence policy, not cosmetics. These tests freeze the
r10 rotation (policy pinned in _registry.py since r8): entries with no
driver evidence lead, then entries whose code changed this round, then
the stalest recorded evidence; every _DRIVER_ORDER_HEAD name must
actually exist (a typo would silently demote an entry to the unchecked
tail)."""

from __future__ import annotations

from iceberg_rest_server_spark.queries import REGISTRY, queries
from iceberg_rest_server_spark.queries._registry import _DRIVER_ORDER_HEAD

# (1) code changed in r10: the exact-Jaccard verify cutover
# re-derivation (operators/dedup.py _BITMAP_MAX_GRAMS 8192→1024 +
# SPARK_GRAFT_JACCARD_VERIFY measurement control, found by the r10
# scaling study measuring the bitmap strategy inverting at 16x scale).
# Results are strategy-independent, but the 6 entries sharing the
# operator re-run per the pinned policy — 5 lead here, the 6th
# (q125_quality_canonical) is already in the stale backlog below.
R10_CHANGED = [
    "q32_ngram_jaccard_pairs",
    "q40_curation_pipeline",
    "q49_dedup_clusters",
    "q96_pagerank_canonical",
    "q152_cluster_safe_split",
]

# (2) the 42 entries whose last driver-recorded green was r04 (computed
# from CORRECTNESS_r01..r09 at the start of r10; matches the list in
# VERDICT r9 "Next round #1") — the r10 window clears this backlog
# entirely so nothing older than r05 remains.
STALE_R04 = [
    "q100_bloom_decontaminate",
    "q101_incremental_mv",
    "q102_tpch_q2",
    "q103_tpch_q9",
    "q104_tpch_q11",
    "q105_tpch_q16",
    "q106_tpch_q20",
    "q107_tpch_q21",
    "q108_event_funnel",
    "q109_cohort_retention",
    "q110_weighted_sample",
    "q112_domain_kl_drift",
    "q113_paragraph_dedup",
    "q114_embedding_quantization",
    "q116_zorder_clustering",
    "q117_source_roundtrip",
    "q118_python_udtf",
    "q119_right_outer_join",
    "q120_leakage_safe_split",
    "q121_vocabulary_oov",
    "q122_grouped_ols_trend",
    "q123_variant_json",
    "q124_asof_attribution",
    "q125_quality_canonical",
    "q37_multimodal_features",
    "q41_percentiles",
    "q42_histogram",
    "q45_hash_sample",
    "q46_stratified_topk",
    "q56_unpivot",
    "q84_skewed_distinct_agg",
    "q85_salted_join",
    "q86_gap_fill_ffill",
    "q89_approx_percentiles",
    "q91_equidepth_histogram",
    "q92_trailing_window_agg",
    "q93_data_quality_checks",
    "q94_unicode_normalize",
    "q95_tpch_q12",
    "q97_ratio_to_report",
    "q98_median_absolute_deviation",
    "q99_substring_dedup",
]

# (3) next-stalest fills: the r05 cohort is 38 entries of equal
# staleness, so the pinned tie-break is alphabetical; the first 3 fill
# the window exactly. The remaining 35 lead r11.
R05_FILLS = [
    "q01_scan_projection",
    "q03_hash_aggregate",
    "q06_approx_distinct",
]


def test_every_head_name_exists():
    missing = [n for n in _DRIVER_ORDER_HEAD if n not in REGISTRY]
    # the single allowed absentee is the protobuf-gated TWS entry
    assert missing in ([], ["q140_stream_transform_with_state"]), missing


def test_window_covers_changed_then_stale_then_fills():
    window = list(queries())[:50]
    # changed entries are checked FIRST (they lead the window), then
    # the whole r04 backlog, then the fills
    assert window[: len(R10_CHANGED)] == R10_CHANGED
    assert window[len(R10_CHANGED) : len(R10_CHANGED) + len(STALE_R04)] == STALE_R04
    assert set(R05_FILLS) <= set(window)
    # the 6th changed-operator entry rides the stale backlog
    assert "q125_quality_canonical" in window
    # exactly full: nothing wasted, nothing spilled
    assert len(set(window)) == 50
    assert len(R10_CHANGED) + len(STALE_R04) + len(R05_FILLS) == 50


def test_ordering_is_reordering_not_selection():
    names = list(queries())
    assert set(names) == set(REGISTRY)
    assert len(names) == len(REGISTRY)
