"""Driver-window contract: the correctness driver checks only the FIRST
50 ``queries()`` entries per round, so the registry's explicit ordering
is load-bearing evidence policy, not cosmetics. These tests freeze the
r9 rotation (policy pinned in _registry.py since r8): entries with no
driver evidence lead, then entries whose code changed this round, then
the stalest recorded evidence; every _DRIVER_ORDER_HEAD name must
actually exist (a typo would silently demote an entry to the unchecked
tail)."""

from __future__ import annotations

from iceberg_rest_server_spark.queries import REGISTRY, queries
from iceberg_rest_server_spark.queries._registry import _DRIVER_ORDER_HEAD

# (1) entries with NO driver-recorded row at r9 start (landed after the
# r8 driver run; judge-verified in VERDICT r8) — must lead the window
NO_EVIDENCE_AT_R9 = [
    "q204_array_fold_kernels",
    "q205_regex_extraction",
    "q206_bitwise_aggregates",
]

# (2) code changed in r9: q198 grew the empty-text guard (ADVICE r8 #1);
# the streaming staging-dir key moved to a stable md5 digest (ADVICE r8
# #3), touching all streaming entries' shared plumbing — the 7 stalest
# affected (last green r05) re-run now, the 4 recent-green (r07/r08)
# ride the normal rotation
R9_CHANGED = [
    "q198_char_entropy",
    "q30_stream_session_window",
    "q39_stream_stateful_user_totals",
    "q57_stream_static_enrich",
    "q58_stream_stream_join",
    "q90_stream_catalog_sink",
    "q115_stream_ingest_dedup",
    "q134_stream_cdc_upsert",
]

# (3) the 39 entries whose last driver-recorded green was r03 (computed
# from CORRECTNESS_r01..r08 at the start of r9) — the r9 window must
# clear this backlog entirely so nothing older than r04 remains
STALE_R03 = [
    "q15_sliding_window",
    "q23_get_json",
    "q33_bpe_token_count",
    "q33_quality_score",
    "q33_tfidf_top_terms",
    "q33_token_stats",
    "q35_cosine_neardup_pairs",
    "q36_ann_bruteforce_topk",
    "q37_multimodal_frames",
    "q37_multimodal_metadata",
    "q40_curation_pipeline",
    "q43_sessionize_batch",
    "q44_pivot_profile",
    "q47_fuzzy_brand_pairs",
    "q48_decontamination",
    "q50_repetition_quality",
    "q51_range_join",
    "q52_latest_by_key",
    "q53_domain_mixture",
    "q59_semantic_dedup",
    "q60_embedding_centroids",
    "q62_stats_moments",
    "q64_tpch_q3",
    "q65_tpch_q4",
    "q66_tpch_q5",
    "q67_tpch_q6",
    "q68_tpch_q7",
    "q70_tpch_q10",
    "q71_tpch_q13",
    "q72_tpch_q14",
    "q73_tpch_q15",
    "q75_tpch_q18",
    "q76_tpch_q19",
    "q77_tpch_q22",
    "q78_pii_redaction",
    "q79_sequence_chunking",
    "q80_token_packing",
    "q81_epoch_shuffle",
    "q87_skyline",
]


def test_every_head_name_exists():
    missing = [n for n in _DRIVER_ORDER_HEAD if n not in REGISTRY]
    # the single allowed absentee is the protobuf-gated TWS entry
    assert missing in ([], ["q140_stream_transform_with_state"]), missing


def test_window_covers_no_evidence_changed_and_stale():
    window = list(queries())[:50]
    # no-evidence entries must be checked FIRST (they lead the window)
    assert window[:3] == NO_EVIDENCE_AT_R9
    assert set(R9_CHANGED) <= set(window)
    assert set(STALE_R03) <= set(window)
    # exactly full: nothing wasted, nothing spilled
    assert len(set(window)) == 50
    assert len(NO_EVIDENCE_AT_R9) + len(R9_CHANGED) + len(STALE_R03) == 50


def test_ordering_is_reordering_not_selection():
    names = list(queries())
    assert set(names) == set(REGISTRY)
    assert len(names) == len(REGISTRY)
