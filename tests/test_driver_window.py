"""Driver-window contract: the correctness driver checks only the FIRST
50 ``queries()`` entries per round, so the registry's explicit ordering
is load-bearing evidence policy, not cosmetics. These tests freeze the
r13 rotation (policy pinned in _registry.py since r8): entries with no
driver evidence lead, then entries whose code changed this round, then
the stalest recorded evidence; every _DRIVER_ORDER_HEAD name must
actually exist (a typo would silently demote an entry to the unchecked
tail)."""

from __future__ import annotations

from iceberg_rest_server_spark.queries import REGISTRY, queries
from iceberg_rest_server_spark.queries._registry import _DRIVER_ORDER_HEAD

# r13 has NO query-operator code changes (the round's diffs are bench
# sample-vector recording, bench_compare/probe_align tool hygiene,
# explain-gate extension, scaling rungs, tests and docs), so the window
# is pure staleness per the pinned policy.

# (1) the 30 entries whose last driver-recorded green was r08 (computed
# from CORRECTNESS_r01..r12; matches VERDICT r12 "Next round #1"
# name-for-name), alphabetical.
STALE_R08 = [
    "q194_ks_two_sample",
    "q195_gini_concentration",
    "q196_running_distinct_users",
    "q197_activity_streaks",
    "q199_multitouch_attribution",
    "q19_except",
    "q19_intersect",
    "q19_union_all",
    "q19_union_distinct",
    "q200_percentile_rank_transform",
    "q201_priority_sample",
    "q202_ngram_novelty",
    "q203_sliding_distinct_users",
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
    "q54_full_outer_join",
    "q55_window_navigation",
    "q61_grouping_id",
]

# (2) fills: the r09 cohort is 47 entries of equal staleness, so the
# pinned tie-break is alphabetical; the first 20 fill the window
# exactly. The remaining 27 lead r14.
R09_FILLS = [
    "q115_stream_ingest_dedup",
    "q134_stream_cdc_upsert",
    "q15_sliding_window",
    "q198_char_entropy",
    "q204_array_fold_kernels",
    "q205_regex_extraction",
    "q206_bitwise_aggregates",
    "q23_get_json",
    "q30_stream_session_window",
    "q33_bpe_token_count",
    "q33_quality_score",
    "q33_tfidf_top_terms",
    "q33_token_stats",
    "q36_ann_bruteforce_topk",
    "q37_multimodal_frames",
    "q37_multimodal_metadata",
    "q39_stream_stateful_user_totals",
    "q43_sessionize_batch",
    "q44_pivot_profile",
    "q47_fuzzy_brand_pairs",
]


def test_every_head_name_exists():
    missing = [n for n in _DRIVER_ORDER_HEAD if n not in REGISTRY]
    # the single allowed absentee is the protobuf-gated TWS entry
    assert missing in ([], ["q140_stream_transform_with_state"]), missing


def test_window_covers_stale_then_fills():
    window = list(queries())[:50]
    assert window[: len(STALE_R08)] == STALE_R08
    assert window[len(STALE_R08) :] == R09_FILLS
    # exactly full: nothing wasted, nothing spilled
    assert len(set(window)) == 50
    assert len(STALE_R08) + len(R09_FILLS) == 50


def test_window_matches_recorded_staleness():
    """The frozen lists above must agree with the committed CORRECTNESS
    artifacts — if a new round record lands, the window (and this test)
    must be recomputed, not left stale."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the r13 window was computed from CORRECTNESS_r01..r12; records
    # from later rounds land AFTER the window ran and must not feed
    # this recomputation. The next rotation bumps this together with
    # the frozen lists above.
    evidence_through = 12
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        if rnd > evidence_through:
            continue
        for k in json.load(open(f)):
            latest[k] = max(latest.get(k, 0), rnd)
    r08 = {k for k, v in latest.items() if v == 8}
    r09 = {k for k, v in latest.items() if v == 9}
    assert set(STALE_R08) == r08
    assert STALE_R08 == sorted(r08)
    assert set(R09_FILLS) == set(sorted(r09)[:20])


def test_ordering_is_reordering_not_selection():
    names = list(queries())
    assert set(names) == set(REGISTRY)
    assert len(names) == len(REGISTRY)
