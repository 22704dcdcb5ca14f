"""Driver-window contract: the correctness driver checks only the FIRST
50 ``queries()`` entries per round, so the registry's explicit ordering
is load-bearing evidence policy, not cosmetics. These tests freeze the
r8 rotation (VERDICT r7 #1): every entry whose last recorded green row
predates r03 sits inside the window, new/changed r8 entries lead it, and
every _DRIVER_ORDER_HEAD name actually exists (a typo would silently
demote an entry to the unchecked tail)."""

from __future__ import annotations

from iceberg_rest_server_spark.queries import REGISTRY, queries
from iceberg_rest_server_spark.queries._registry import _DRIVER_ORDER_HEAD

# the 32 entries whose last driver-recorded green was r01/r02 (computed
# from CORRECTNESS_r01..r07 at the start of r8) — the r8 window must
# clear this backlog entirely
STALE_PRE_R03 = [
    "q02_filter",
    "q04_global_aggregate",
    "q05_distinct_aggregate",
    "q10_left_outer_join",
    "q11_left_semi_join",
    "q12_left_anti_join",
    "q13_theta_join",
    "q15_cube",
    "q15_grouping_sets",
    "q17_window_frames",
    "q19_except",
    "q19_intersect",
    "q19_union_all",
    "q19_union_distinct",
    "q20_string_functions",
    "q21_date_functions",
    "q22_math_functions",
    "q23_array_map_json",
    "q23_explode_json",
    "q24_conditional_null",
    "q25_correlated_subquery",
    "q25_subqueries",
    "q26_cte",
    "q27_udf_parity",
    "q28_grouped_pandas_udaf",
    "q33_fingerprint",
    "q33_lang_id",
    "q33_top_terms",
    "q49_dedup_clusters",
    "q54_full_outer_join",
    "q55_window_navigation",
    "q61_grouping_id",
]

R8_NEW_OR_CHANGED = [
    "q189_stable_row_ids",
    "q190_ohlc_bars",
    "q191_benford_deviation",
    "q192_fk_integrity_audit",
    "q193_inverted_index_postings",
    "q194_ks_two_sample",
    "q195_gini_concentration",
    "q196_running_distinct_users",
    "q197_activity_streaks",
    "q198_char_entropy",
    "q199_multitouch_attribution",
    "q200_percentile_rank_transform",
    "q201_priority_sample",
    "q202_ngram_novelty",
    "q203_sliding_distinct_users",
    "q140_processor_logic_batch",
    "q166_pca_top_components",
    "q172_stream_sliding_window",
]


def test_every_head_name_exists():
    missing = [n for n in _DRIVER_ORDER_HEAD if n not in REGISTRY]
    # the single allowed absentee is the protobuf-gated TWS entry
    assert missing in ([], ["q140_stream_transform_with_state"]), missing


def test_window_covers_stale_and_new():
    window = list(queries())[:50]
    assert set(R8_NEW_OR_CHANGED) <= set(window)
    assert set(STALE_PRE_R03) <= set(window)
    # exactly full: nothing wasted, nothing spilled
    assert len(set(window)) == 50


def test_ordering_is_reordering_not_selection():
    names = list(queries())
    assert set(names) == set(REGISTRY)
    assert len(names) == len(REGISTRY)
